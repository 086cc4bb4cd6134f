"""Independent truth for sim_ann_recall (driver-side tooling; not part
of the Scala library): exact cosine / integer-L2 top-10 ground truth,
IVF cell assignment, probe sets, and PQ asymmetric-distance ranking,
all recomputed from raw parquet in pure python — zero JVM involvement,
the recall_oracle.py discipline applied to the ANN family.

Mirrors the engine bit-for-bit where floats are involved:
  - dot products are LEFT-TO-RIGHT IEEE folds (acc += a[i]*b[i]),
    matching graft.expr.DotProductF64;
  - cosine is dot / (nrm_a * nrm_b) — multiply first, one division;
  - the integer grid is floor((x + 1.0) * 1000000.0) per component,
    matching the ml_kmeans micro-unit convention (python floats ARE
    IEEE doubles, and parquet float32 -> double is exact).

Emits the pinned VALUES oracle body on stdout.

    python3 tools/ann_recall_oracle.py [sf_dir]
"""
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
CENTROID_IDS = [7, 29, 83, 131, 173, 211, 307, 401]
CODEBOOK_IDS = [11, 47, 97, 151]
NPROBES = [1, 2, 4, 8]
PQ_SUB, PQ_SUBDIM, TOPK = 4, 16, 10


def dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def main():
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    emb = {vid: [float(x) for x in v] for vid, v in rows}
    nrm = {vid: math.sqrt(dot(v, v)) for vid, v in emb.items()}
    pts = {vid: [math.floor((x + 1.0) * 1000000.0) for x in v]
           for vid, v in emb.items()}

    def cos(a, b):
        return dot(emb[a], emb[b]) / (nrm[a] * nrm[b])

    # IVF: scored centroid list per vector = sort by (-cos, cid) asc
    def scored(v):
        return sorted(((cos(v, c) * -1, c) for c in CENTROID_IDS))

    cell = {v: scored(v)[0][1] for v in emb}
    queries = [v for v in sorted(emb) if v < 5]

    # PQ: encode + per-query distance tables
    def sub(p, i):
        return p[i * PQ_SUBDIM:(i + 1) * PQ_SUBDIM]

    def sqd(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    code = {v: [min((sqd(sub(p, i), sub(pts[c], i)), c)
                    for c in CODEBOOK_IDS)[1]
                for i in range(PQ_SUB)]
            for v, p in pts.items()}
    dtab = {q: {(i, c): sqd(sub(pts[q], i), sub(pts[c], i))
                for i in range(PQ_SUB) for c in CODEBOOK_IDS}
            for q in queries}

    def adist(q, v):
        return sum(dtab[q][(i, code[v][i])] for i in range(PQ_SUB))

    out = []
    for algo in ('ivf', 'ivfpq'):
        for np_ in NPROBES:
            for q in queries:
                probed = {c for _, c in scored(q)[:np_]}
                others = [v for v in emb if v != q]
                cands = [v for v in others if cell[v] in probed]
                if algo == 'ivf':
                    truth = sorted(others, key=lambda v: (-cos(q, v), v))
                    top = sorted(cands, key=lambda v: (-cos(q, v), v))
                else:
                    truth = sorted(others, key=lambda v: (sqd(pts[q],
                        pts[v]), v))
                    top = sorted(cands, key=lambda v: (adist(q, v), v))
                hits = len(set(truth[:TOPK]) & set(top[:TOPK]))
                out.append((algo, np_, q, hits))

    print("VALUES")
    print(",\n".join(f"  ('{a}', {n}, {q}, {h})" for a, n, q, h in out))
    # summary for the scaladoc / spec comments
    for algo in ('ivf', 'ivfpq'):
        for np_ in NPROBES:
            hs = [h for a, n, q, h in out if a == algo and n == np_]
            print(f"-- {algo} nprobe={np_}: mean recall@10 = "
                  f"{sum(hs) / (TOPK * len(hs)):.2f}", file=sys.stderr)


if __name__ == '__main__':
    main()
