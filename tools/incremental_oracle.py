"""Independent pure-python reference for dedup_incremental (same
validated XXH64 stack + shingle/signature/band pipeline as
minhash_oracle.py): even doc_ids form the stored index, odd doc_ids are
the new batch; a new doc is a dup of its best partner at est >= 0.5
among index docs or lower-id batch docs. Cross-checks the engine dump
at /tmp/verify_out (or /tmp/vnew), then --emit writes the pinned Scala
oracle to src/main/scala/graft/ops/IncrementalPins.scala."""
import sys
sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
import duckdb
from collections import defaultdict
from xxh64 import hash_int, hash_bytes, hash_long, signed

SF = '/root/testdata/sf0.01'
K = 16
BAND_W = 4
THRESH = 0.5

docs = duckdb.sql(
    f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
).fetchall()


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


SEEDS = [hash_int(i, 42) for i in range(K)]
sigs, nsh = {}, {}
for doc_id, text in docs:
    sh = doc_shingles(text)
    nsh[doc_id] = len(sh)
    sig = []
    for i in range(K):
        m = None
        for g in sh:
            h = signed(hash_bytes(g.encode('utf-8'), SEEDS[i]))
            if m is None or h < m:
                m = h
        sig.append(m if m is not None else (1 << 63) - 1)
    sigs[doc_id] = sig


def band_hash(vals):
    h = 42
    for v in vals:
        h = hash_long(v, h)
    return signed(h)


buckets = defaultdict(list)
for d, sig in sigs.items():
    for b in range(K // BAND_W):
        buckets[(b, band_hash(sig[b * 4:b * 4 + 4]))].append(d)

# candidate partners per NEW (odd) doc: index (even) docs or lower-id
# odd docs sharing any bucket
partners = defaultdict(set)
for ids in buckets.values():
    for b in ids:
        if b % 2 == 1:
            for a in ids:
                if a != b and (a % 2 == 0 or a < b):
                    partners[b].add(a)

rows = []
for b in sorted(d for d in sigs if d % 2 == 1):
    best = None
    for a in partners[b]:
        agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        e = agree / K
        if e >= THRESH and (best is None or (-e, a) < (-best[1], best[0])):
            best = (a, e)
    if best is None:
        rows.append((b, nsh[b], len(partners[b]), None, None, 'keep'))
    else:
        rows.append((b, nsh[b], len(partners[b]), best[0], best[1], 'dup'))


def check(outdir):
    try:
        eng = duckdb.sql(
            "SELECT doc_id, n_shingles, n_candidates, dup_of, est_jaccard,"
            f" decision FROM '{outdir}/dedup_incremental/*.parquet'"
            " ORDER BY doc_id").fetchall()
        ok = [tuple(r) for r in eng] == rows
        print('dedup_incremental cross-check:',
              'MATCH' if ok else 'MISMATCH', len(rows))
        if not ok:
            for a, b in zip(eng, rows):
                if tuple(a) != b:
                    print(' first diff: engine', a, 'python', b)
                    break
        return ok
    except Exception as e:
        print('no engine output:', e)
        return False


for outdir in ('/tmp/vnew', '/tmp/verify_out'):
    if check(outdir):
        break

if '--emit' in sys.argv:
    def sq(v):
        if v is None:
            return 'NULL'
        if isinstance(v, float):
            return repr(v)
        return str(v)
    vals = ',\n'.join(
        f"({d}, {n}, {nc}, {sq(a)}, {sq(e)}, '{dec}')"
        for d, n, nc, a, e, dec in rows)
    body = f'''package graft.ops

/** GENERATED pinned oracle for dedup_incremental (tools-side
  * generator: tools/incremental_oracle.py — the same independent
  * pure-python XXH64 + shingle/signature/band stack that pins the rest
  * of the minhash family, with the incremental index/batch split).
  * Pinned to the driver's correctness SF like the other minhash pins. */
object IncrementalPins {{
  val dedupIncremental: String = """SELECT doc_id::BIGINT AS doc_id,
 n_shingles::BIGINT AS n_shingles, n_candidates::BIGINT AS n_candidates,
 dup_of::BIGINT AS dup_of, est_jaccard::DOUBLE AS est_jaccard, decision
 FROM (VALUES
{vals})
 t(doc_id, n_shingles, n_candidates, dup_of, est_jaccard, decision)
 ORDER BY doc_id"""
}}
'''
    open('src/main/scala/graft/ops/IncrementalPins.scala', 'w').write(body)
    print('IncrementalPins.scala written')
