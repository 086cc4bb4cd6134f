"""Independent truth for sim_ann_recall (driver-side tooling; not part
of the Scala library): exact cosine / integer-L2 top-10 ground truth,
IVF cell assignment, probe sets, per-regime Lloyd-trained PQ codebooks,
and PQ asymmetric-distance ranking, all recomputed from raw parquet in
pure python — zero JVM involvement, the recall_oracle.py discipline
applied to the ANN family.

Mirrors the engine bit-for-bit where floats are involved:
  - dot products are LEFT-TO-RIGHT IEEE folds (acc += a[i]*b[i]),
    matching graft.expr.DotProductF64;
  - cosine is dot / (nrm_a * nrm_b) — multiply first, one division;
  - the integer grid is floor((x + 1.0) * 1000000.0) per component,
    matching the ml_kmeans micro-unit convention (python floats ARE
    IEEE doubles, and parquet float32 -> double is exact);
  - codebook training is 3 Lloyd iterations per 16-dim subspace:
    seeds = 8 fixed vec_ids, (dist, cid) argmin assignment, and
    elementwise sum // count means (all grid values non-negative, so
    python's floor // == Spark's `div` == DuckDB's `//`).

Two regimes, matching graft.ops.Pipeline#simAnnRecall:
  uniform   — the corpus embeddings as-is (cosine on the raw doubles);
  clustered — planted clusters: cluster(v) = v mod NC with
              NC = max(8, n // 11); grid vector = (19*anchor) // 20 +
              own // 20 per component; cosine runs on the grid-as-
              double for this regime.

Emits the pinned VALUES oracle body on stdout.

    python3 tools/ann_recall_oracle.py [sf_dir]
"""
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
CENTROID_IDS = [7, 29, 83, 131, 173, 211, 307, 401]
SEED_IDS = [11, 29, 47, 83, 97, 131, 151, 173]
NPROBES = [1, 2, 4, 8]
PQ_SUB, PQ_SUBDIM, TOPK, PQ_ITERS = 4, 16, 10, 3


def dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def sub(p, i):
    return p[i * PQ_SUBDIM:(i + 1) * PQ_SUBDIM]


def sqd(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def train_codebook(pts):
    """Per-subspace Lloyd on the integer grid: seeds -> 3 iterations of
    (dist, cid) argmin assignment + elementwise sum // count means.
    Returns {(sub, cid): entry}; empty entries drop and stay dropped."""
    cb = {(i, c): list(sub(pts[c], i))
          for i in range(PQ_SUB) for c in SEED_IDS if c in pts}
    for _ in range(PQ_ITERS):
        sums = {}
        for v, p in pts.items():
            for i in range(PQ_SUB):
                pv = sub(p, i)
                cid = min((sqd(pv, e), c)
                          for (j, c), e in cb.items() if j == i)[1]
                acc = sums.setdefault((i, cid), [0, [0] * PQ_SUBDIM])
                acc[0] += 1
                for k, x in enumerate(pv):
                    acc[1][k] += x
        cb = {(i, c): [s // n for s in vec]
              for (i, c), (n, vec) in sums.items()}
    return cb


def audit(regime, emb, pts, out):
    nrm = {vid: math.sqrt(dot(v, v)) for vid, v in emb.items()}

    def cos(a, b):
        return dot(emb[a], emb[b]) / (nrm[a] * nrm[b])

    # IVF: scored centroid list per vector = sort by (-cos, cid) asc
    def scored(v):
        return sorted(((cos(v, c) * -1, c) for c in CENTROID_IDS))

    cell = {v: scored(v)[0][1] for v in emb}
    queries = [v for v in sorted(emb) if v < 5]

    cb = train_codebook(pts)
    ents = {i: sorted(c for (j, c) in cb if j == i)
            for i in range(PQ_SUB)}
    code = {v: [min((sqd(sub(p, i), cb[(i, c)]), c)
                    for c in ents[i])[1]
                for i in range(PQ_SUB)]
            for v, p in pts.items()}
    dtab = {q: {(i, c): sqd(sub(pts[q], i), cb[(i, c)])
                for i in range(PQ_SUB) for c in ents[i]}
            for q in queries}

    def adist(q, v):
        return sum(dtab[q][(i, code[v][i])] for i in range(PQ_SUB))

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
                out.append((regime, algo, np_, q, hits))


def main():
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    emb = {vid: [float(x) for x in v] for vid, v in rows}
    pts = {vid: [math.floor((x + 1.0) * 1000000.0) for x in v]
           for vid, v in emb.items()}
    nc = max(8, len(emb) // 11)
    cpts = {vid: [19 * a // 20 + b // 20
                  for a, b in zip(pts[vid % nc], p)]
            for vid, p in pts.items()}
    cemb = {vid: [float(x) for x in p] for vid, p in cpts.items()}

    out = []
    audit('uniform', emb, pts, out)
    audit('clustered', cemb, cpts, out)
    out.sort()

    print("VALUES")
    print(",\n".join(f"  ('{r}', '{a}', {n}, {q}, {h})"
                     for r, a, n, q, h in out))
    # summary for the scaladoc / spec comments
    for regime in ('uniform', 'clustered'):
        for algo in ('ivf', 'ivfpq'):
            for np_ in NPROBES:
                hs = [h for r, a, n, q, h in out
                      if r == regime and a == algo and n == np_]
                print(f"-- {regime} {algo} nprobe={np_}: mean recall@10 ="
                      f" {sum(hs) / (TOPK * len(hs)):.2f}", file=sys.stderr)


if __name__ == '__main__':
    main()
