"""Independent replication of dedup_phash (driver-side tooling) over
the SELF-BUILT media fixture: regenerates the authored pixels from the
Media.scala PIXEL SPEC in pure python (no JVM codec), computes the 8x8
integer average-hash per image file, and emits the hamming<=4 pairs as
the pinned VALUES oracle after cross-checking engine output in
/tmp/verify_out (when present). Each BMP original must pair ONLY with
its own PNG re-encode. Usage: python3 tools/phash_oracle.py"""
from itertools import combinations

from mm_oracle import N_IMAGES, ahash, luma, pixels

hs = {}
for i in range(N_IMAGES):
    hs[f'img_{i:02d}.bmp'] = ahash(luma(pixels(i, reenc=False)))
    hs[f'img_{i:02d}.png'] = ahash(luma(pixels(i, reenc=True)))

pairs = [(a, b, bin(hs[a] ^ hs[b]).count('1'))
         for a, b in combinations(sorted(hs), 2)]
close = sorted(p for p in pairs if p[2] <= 4)
cross = min((p for p in pairs if p[0][:6] != p[1][:6]),
            key=lambda p: p[2])
print(f'-- {len(close)} close pairs; nearest cross-image pair at '
      f'hamming {cross[2]} ({cross[0]} ~ {cross[1]})')
assert all(a[:6] == b[:6] for a, b, _ in close), \
    'close pairs must be original~reencode only'
assert len(close) == N_IMAGES, 'every original must pair with its re-encode'

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
