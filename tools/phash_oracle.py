"""Independent replication of dedup_phash (driver-side tooling): the
64-sample average-hash + re-encode variant + hamming pairs over the
sf0.01 parquet blobs, in pure python byte math. Emits the pinned VALUES
oracle after cross-checking against engine output in /tmp/verify_out
(when present). Usage: python3 tools/phash_oracle.py"""
from itertools import combinations
from pathlib import Path

SF = Path('/root/testdata/sf0.01')


def ahash(b):
    n = 64
    stride = max(1, len(b) // n)
    thumb = [0] * n
    i = 0
    while i < n and i * stride < len(b):
        thumb[i] = b[i * stride]
        i += 1
    mean = sum(thumb) / n
    return sum(1 << i for i in range(n) if thumb[i] > mean)


hs = {}
for f in sorted(SF.glob('*.parquet')):
    b = bytearray(f.read_bytes())
    v = bytearray(b)
    for j in range(0, len(v), 997):
        v[j] ^= 1
    hs[f.name] = ahash(b)
    hs[f.name + '~reenc'] = ahash(v)

pairs = [(a, b, bin(hs[a] ^ hs[b]).count('1'))
         for a, b in combinations(sorted(hs), 2)]
close = sorted(p for p in pairs if p[2] <= 4)

try:
    import duckdb
    eng = duckdb.sql(
        "SELECT a_id, b_id, hamming FROM '/tmp/verify_out/dedup_phash/*.parquet' "
        "ORDER BY a_id, b_id").fetchall()
    assert [tuple(r) for r in eng] == close, (eng, close)
    print('-- engine output cross-checked OK')
except Exception as e:  # no verify output yet — emit pins anyway
    print(f'-- (no cross-check: {e})')

rows = ',\n'.join(f"('{a}', '{b}', {h})" for a, b, h in close)
print(f"""    "dedup_phash" ->
      \"\"\"SELECT a_id, b_id, hamming::BIGINT AS hamming FROM (VALUES
{rows})
         t(a_id, b_id, hamming) ORDER BY a_id, b_id\"\"\",""")
