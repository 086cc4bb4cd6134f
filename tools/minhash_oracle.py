"""Independent minhash family implementation (raw parquet + validated
pure-python XXH64). Cross-checks against the engine's outputs, then
emits pinned VALUES oracles for dedup_minhash, dedup_minhash_agg,
dedup_cluster."""
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
        # concat_ws skips nulls (missing trailing tokens)
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
            if m is None or h < m:  # SIGNED compare, like Java long <
                m = h
        sig.append(m if m is not None else (1 << 63) - 1)
    sigs[doc_id] = sig

# --- bands: chained builtin xxhash64 over 4 signed longs, seed 42 ---
def band_hash(vals):
    h = 42
    for v in vals:
        h = hash_long(v, h)
    return signed(h)

buckets = defaultdict(list)
for d, sig in sigs.items():
    for b in range(K // BAND_W):
        buckets[(b, band_hash(sig[b * 4:b * 4 + 4]))].append(d)

est = {}
for ids in buckets.values():
    ids.sort()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if (a, b) not in est:
                agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
                est[(a, b)] = agree / K

ncand = defaultdict(int)
for (a, b) in est:
    ncand[a] += 1
    ncand[b] += 1
dups = {}
for (a, b), e in est.items():
    if e >= THRESH:
        cur = dups.get(b)
        # rn=1 by (est DESC, a_id ASC)
        if cur is None or (-e, a) < (-cur[1], cur[0]):
            dups[b] = (a, e)

mh_rows = []
for d in sorted(sigs):
    if d in dups:
        a, e = dups[d]
        mh_rows.append((d, nsh[d], sigs[d][0], ncand.get(d, 0), a, e, 'dup'))
    else:
        mh_rows.append((d, nsh[d], sigs[d][0], ncand.get(d, 0), None, None, 'keep'))

agg_rows = [(d, sigs[d][0], sigs[d][15]) for d in sorted(sigs)]

# --- clusters: connected components over est >= THRESH pairs ---
parent = {d: d for d in sigs}
def find(x):
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x
def union(a, b):
    ra, rb = find(a), find(b)
    if ra != rb:
        if ra > rb:
            ra, rb = rb, ra
        parent[rb] = ra
for (a, b), e in est.items():
    if e >= THRESH:
        union(a, b)
comp = defaultdict(list)
for d in sigs:
    comp[find(d)].append(d)
cl_rows = []
for d in sorted(sigs):
    root = find(d)
    label = min(comp[root])
    cl_rows.append((d, label, len(comp[root]), d == label))

def check(name, sql_cols, rows):
    try:
        eng = duckdb.sql(
            f"SELECT {sql_cols} FROM '/tmp/verify_out/{name}/*.parquet'"
            " ORDER BY doc_id").fetchall()
        ok = [tuple(r) for r in eng] == rows
        print(f'{name} cross-check:', 'MATCH' if ok else 'MISMATCH', len(rows))
        if not ok:
            for a, b in zip(eng, rows):
                if tuple(a) != b:
                    print(' first diff: engine', a, 'python', b)
                    break
    except Exception as e:
        print(f'{name}: no engine output:', e)

check('dedup_minhash',
      'doc_id, n_shingles, sig0, n_candidates, dup_of, est_jaccard, decision',
      mh_rows)
check('dedup_minhash_agg', 'doc_id, sig0, sig15', agg_rows)
check('dedup_cluster', 'doc_id, cluster, cluster_size, is_representative',
      cl_rows)

if '--emit' in sys.argv:
    def sq(v):
        if v is None:
            return 'NULL'
        if isinstance(v, bool):
            return 'true' if v else 'false'
        if isinstance(v, float):
            return repr(v)
        return str(v)
    vals = ',\n'.join(
        f"({d}, {n}, {s0}, {nc}, {sq(a)}, {sq(e)}, '{dec}')"
        for d, n, s0, nc, a, e, dec in mh_rows)
    open('/tmp/oracle_dedup_minhash.sql', 'w').write(
        "SELECT doc_id::BIGINT AS doc_id, n_shingles::BIGINT AS n_shingles,"
        " sig0::BIGINT AS sig0, n_candidates::BIGINT AS n_candidates,"
        " dup_of::BIGINT AS dup_of, est_jaccard::DOUBLE AS est_jaccard, decision"
        " FROM (VALUES\n" + vals
        + ")\n t(doc_id, n_shingles, sig0, n_candidates, dup_of, est_jaccard,"
        " decision) ORDER BY doc_id")
    vals = ',\n'.join(f"({d}, {s0}, {s15})" for d, s0, s15 in agg_rows)
    open('/tmp/oracle_dedup_minhash_agg.sql', 'w').write(
        "SELECT doc_id::BIGINT AS doc_id, sig0::BIGINT AS sig0,"
        " sig15::BIGINT AS sig15 FROM (VALUES\n" + vals
        + ")\n t(doc_id, sig0, sig15) ORDER BY doc_id")
    vals = ',\n'.join(
        f"({d}, {c}, {n}, {sq(r)})" for d, c, n, r in cl_rows)
    open('/tmp/oracle_dedup_cluster.sql', 'w').write(
        "SELECT doc_id::BIGINT AS doc_id, cluster::BIGINT AS cluster,"
        " cluster_size::BIGINT AS cluster_size, is_representative"
        " FROM (VALUES\n" + vals
        + ")\n t(doc_id, cluster, cluster_size, is_representative)"
        " ORDER BY doc_id")
    print('oracles written')
