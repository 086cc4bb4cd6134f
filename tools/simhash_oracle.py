"""Independent simhash implementation (reads raw documents.parquet,
uses the validated pure-python XXH64) — generates pinned VALUES oracles
for dedup_simhash and dedup_simhash_pairs, cross-checked against the
engine's current output before pinning."""
import sys
sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
import duckdb
from xxh64 import spark_xxhash64_str

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'

docs = duckdb.sql(
    f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
).fetchall()


def java_split(s, sep=' '):
    parts = s.split(sep)
    while parts and parts[-1] == '':  # Java split drops trailing empties
        parts.pop()
    return parts


fps = {}
for doc_id, text in docs:
    votes = [0] * 64
    for w in java_split(text):
        h = spark_xxhash64_str(w)  # signed; bit i unaffected by sign
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    fp_lo = sum(1 << i for i in range(32) if votes[i] > 0)
    fp_hi = sum(1 << (i - 32) for i in range(32, 64) if votes[i] > 0)
    fps[doc_id] = (fp_hi, fp_lo)

# --- dedup_simhash: (doc_id, simhash hex) ---
simhash_rows = [(d, '%08x%08x' % fps[d]) for d in sorted(fps)]

# cross-check against the engine's current output
try:
    eng = duckdb.sql(
        "SELECT doc_id, simhash FROM '/tmp/verify_out/dedup_simhash/*.parquet'"
        " ORDER BY doc_id").fetchall()
    ok = [tuple(r) for r in eng] == simhash_rows
    print('dedup_simhash cross-check:', 'MATCH' if ok else 'MISMATCH',
          len(simhash_rows), 'rows')
    if not ok:
        for a, b in zip(eng, simhash_rows):
            if tuple(a) != b:
                print(' first diff: engine', a, 'python', b)
                break
except Exception as e:
    print('no engine output to cross-check:', e)

# --- dedup_simhash_pairs ---
full = {d: (hi << 32) | lo for d, (hi, lo) in fps.items()}
from collections import defaultdict
buckets = defaultdict(list)
for d, fp in full.items():
    for ci in range(4):
        buckets[(ci, (fp >> (ci * 16)) & 0xFFFF)].append(d)
cand = {}
for ids in buckets.values():
    ids.sort()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if (a, b) not in cand:
                cand[(a, b)] = bin(full[a] ^ full[b]).count('1')
ncand = defaultdict(int)
for (a, b) in cand:
    ncand[a] += 1
    ncand[b] += 1
dups = {}
for (a, b), ham in cand.items():
    if ham <= 3:
        cur = dups.get(b)
        if cur is None or (ham, a) < cur:
            dups[b] = (ham, a)
pair_rows = []
for d in sorted(fps):
    if d in dups:
        ham, a = dups[d]
        pair_rows.append((d, ncand.get(d, 0), a, ham, 'dup'))
    else:
        pair_rows.append((d, ncand.get(d, 0), None, None, 'keep'))

try:
    eng = duckdb.sql(
        "SELECT doc_id, n_candidates, dup_of, hamming, decision"
        " FROM '/tmp/verify_out/dedup_simhash_pairs/*.parquet'"
        " ORDER BY doc_id").fetchall()
    ok = [tuple(r) for r in eng] == pair_rows
    print('dedup_simhash_pairs cross-check:', 'MATCH' if ok else 'MISMATCH',
          len(pair_rows), 'rows')
    if not ok:
        for a, b in zip(eng, pair_rows):
            if tuple(a) != b:
                print(' first diff: engine', a, 'python', b)
                break
except Exception as e:
    print('no engine output to cross-check:', e)

# --- emit VALUES oracles ---
if '--emit' in sys.argv:
    vals = ',\n'.join(f"({d}, '{h}')" for d, h in simhash_rows)
    open('/tmp/oracle_dedup_simhash.sql', 'w').write(
        "SELECT doc_id::BIGINT AS doc_id, simhash FROM (VALUES\n"
        + vals + ")\n t(doc_id, simhash) ORDER BY doc_id")
    def sq(v):
        return 'NULL' if v is None else str(v)
    vals = ',\n'.join(
        f"({d}, {n}, {sq(a)}, {sq(h)}, '{dec}')"
        for d, n, a, h, dec in pair_rows)
    open('/tmp/oracle_dedup_simhash_pairs.sql', 'w').write(
        "SELECT doc_id::BIGINT AS doc_id, n_candidates::BIGINT AS n_candidates,"
        " dup_of::BIGINT AS dup_of, hamming::BIGINT AS hamming, decision"
        " FROM (VALUES\n" + vals
        + ")\n t(doc_id, n_candidates, dup_of, hamming, decision)"
        " ORDER BY doc_id")
    print('oracles written')
