"""Independent truth for dedup_minhash_recall (driver-side tooling; not
part of the Scala library): exact shared-shingle Jaccard pairs (3I >=
na+nb, pure integers) and LSH band-join membership, computed from raw
parquet with the validated pure-python XXH64 stack — zero JVM
involvement, same discipline as minhash_oracle.py. Emits the pinned
VALUES oracle body on stdout.

    python3 tools/recall_oracle.py [sf_dir]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
import duckdb
from collections import defaultdict
from xxh64 import hash_int, hash_bytes, hash_long, signed

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
K = 16
BAND_W = 4


def java_split(s, sep=' '):
    parts = s.split(sep)
    while parts and parts[-1] == '':
        parts.pop()
    return parts


def doc_shingles(text):
    toks = java_split(text)
    n = max(len(toks) - 2, 1)
    seen, out = set(), []
    for i in range(1, n + 1):
        parts = [toks[j - 1] for j in (i, i + 1, i + 2) if j <= len(toks)]
        g = ' '.join(parts)
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def main():
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    SEEDS = [hash_int(i, 42) for i in range(K)]
    sigs, shash = {}, {}
    for doc_id, text in docs:
        sh = doc_shingles(text)
        # the engine joins on xxhash64(shingle) (seed 42) — mirror it so a
        # hash collision would surface as a pin mismatch, not hide
        shash[doc_id] = {signed(hash_bytes(g.encode('utf-8'), 42)) for g in sh}
        sigs[doc_id] = [
            min((signed(hash_bytes(g.encode('utf-8'), SEEDS[i])) for g in sh),
                default=(1 << 63) - 1)
            for i in range(K)]

    # truth: pairs sharing >= 1 shingle hash, exact integer jaccard test
    inv = defaultdict(list)
    for d, hs in shash.items():
        for h in hs:
            inv[h].append(d)
    inter = defaultdict(int)
    for ids in inv.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter[(ids[i], ids[j])] += 1
    truth = {(a, b): i for (a, b), i in inter.items()
             if 3 * i >= len(shash[a]) + len(shash[b])}

    # LSH candidates: chained-xxhash64 band buckets (minhash_oracle.py)
    def band_hash(vals):
        h = 42
        for v in vals:
            h = hash_long(v, h)
        return signed(h)

    buckets = defaultdict(list)
    for d, sig in sigs.items():
        for b in range(K // BAND_W):
            buckets[(b, band_hash(sig[b * BAND_W:(b + 1) * BAND_W]))].append(d)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))

    rows = []
    for (a, b) in sorted(truth):
        rows.append((a, b, truth[(a, b)], len(shash[a]), len(shash[b]),
                     (a, b) in cand))
    found = sum(1 for r in rows if r[5])
    print(f"-- {len(rows)} truth pairs, {found} found by LSH "
          f"(recall {found/len(rows):.3f}), {len(cand)} candidates", )
    vals = ",\n".join(
        f"           ({a}, {b}, {i}, {na}, {nb}, {str(fl).lower()})"
        for a, b, i, na, nb, fl in rows)
    print('      """SELECT * FROM (VALUES')
    print(vals + ')')
    print('         t(a_id, b_id, n_shared, na, nb, in_lsh)')
    print('         ORDER BY a_id, b_id""",')


if __name__ == '__main__':
    main()
