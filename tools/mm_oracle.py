"""Independent replication of the mm_* stub decoders (deterministic
byte-level math over the sf0.01 parquet files, 64-bit wrap-around like
Java long arithmetic) — generates pinned VALUES oracles after
cross-checking against the engine output in /tmp/verify_out."""
import sys
from pathlib import Path

import duckdb

SF = Path('/root/testdata/sf0.01')
M = (1 << 64) - 1


def signed(h):
    h &= M
    return h - (1 << 64) if h >= (1 << 63) else h


files = sorted(SF.glob('*.parquet'))

decode_rows = []
frame_rows = []
resize_rows = []
for f in files:
    b = f.read_bytes()
    n = len(b)
    # mm_decode: rolling *31 hash over the first 4096 bytes
    h = 1125899906842597
    for x in b[:4096]:
        h = (h * 31 + x) & M
    decode_rows.append((f.name, n, signed(h), n % 1024))
    # mm_frames: 4096-byte blocks sampled every 32768 bytes, *131 checksum
    block, stride = 4096, 8
    for off in range(0, n, block * stride):
        end = min(off + block, n)
        c = 0
        for x in b[off:end]:
            c = (c * 131 + x) & M
        frame_rows.append((f.name, off // (block * stride), end - off,
                           signed(c)))
    # mm_resize: 16x16 byte thumbnail at stride len//256, *131 checksum
    side = 16
    st = max(1, n // (side * side))
    thumb = bytearray(side * side)
    i = 0
    while i < side * side and i * st < n:
        thumb[i] = b[i * st]
        i += 1
    c = 0
    for x in thumb:
        c = (c * 131 + x) & M
    resize_rows.append((f.name, side, side, side * side, signed(c)))

frame_rows.sort(key=lambda r: (r[0], r[1]))


def check(name, sql_cols, rows, order):
    try:
        eng = duckdb.sql(
            f"SELECT {sql_cols} FROM '/tmp/verify_out/{name}/*.parquet'"
            f" ORDER BY {order}").fetchall()
        ok = [tuple(r) for r in eng] == rows
        print(f'{name} cross-check:', 'MATCH' if ok else 'MISMATCH', len(rows))
        if not ok:
            for a, b in zip(eng, rows):
                if tuple(a) != b:
                    print(' first diff: engine', a, 'python', b)
                    break
    except Exception as e:
        print(f'{name}: no engine output:', e)


check('mm_decode', 'file_name, n_bytes, feat_hash, fake_width',
      decode_rows, 'file_name')
check('mm_frames', 'file_name, frame_idx, frame_bytes, frame_checksum',
      frame_rows, 'file_name, frame_idx')
check('mm_resize', 'file_name, width, height, thumb_bytes, thumb_checksum',
      resize_rows, 'file_name')

if '--emit' in sys.argv:
    out = {}
    vals = ',\n'.join(f"('{f}', {n}, {h}, {w})"
                      for f, n, h, w in decode_rows)
    out['mm_decode'] = (
        "SELECT file_name, n_bytes::BIGINT AS n_bytes,"
        " feat_hash::BIGINT AS feat_hash, fake_width::BIGINT AS fake_width"
        " FROM (VALUES\n" + vals
        + ")\n t(file_name, n_bytes, feat_hash, fake_width)"
        " ORDER BY file_name")
    vals = ',\n'.join(f"('{f}', {i}, {nb}, {c})"
                      for f, i, nb, c in frame_rows)
    out['mm_frames'] = (
        "SELECT file_name, frame_idx::BIGINT AS frame_idx,"
        " frame_bytes::BIGINT AS frame_bytes,"
        " frame_checksum::BIGINT AS frame_checksum FROM (VALUES\n" + vals
        + ")\n t(file_name, frame_idx, frame_bytes, frame_checksum)"
        " ORDER BY file_name, frame_idx")
    vals = ',\n'.join(f"('{f}', {w}, {hh}, {tb}, {c})"
                      for f, w, hh, tb, c in resize_rows)
    out['mm_resize'] = (
        "SELECT file_name, width::INT AS width, height::INT AS height,"
        " thumb_bytes::BIGINT AS thumb_bytes,"
        " thumb_checksum::BIGINT AS thumb_checksum FROM (VALUES\n" + vals
        + ")\n t(file_name, width, height, thumb_bytes, thumb_checksum)"
        " ORDER BY file_name")
    def scala_triple(s):
        return s.replace('\\', '\\\\')
    body = f'''package graft.ops

/** GENERATED pinned oracles for the mm_* stub decoders (tools/
  * mm_oracle.py: independent python replication of the deterministic
  * byte-level stub math over the sf0.01 parquet files, cross-checked
  * against engine output before pinning). The STUB decode itself stays
  * honestly labeled — these pins verify the Spark plumbing (binaryFile
  * scan, typed mapPartitions batch shape, flatMap framing) end-to-end. */
object MmPins {{
  val mmDecode: String = """{scala_triple(out['mm_decode'])}"""

  val mmFrames: String = """{scala_triple(out['mm_frames'])}"""

  val mmResize: String = """{scala_triple(out['mm_resize'])}"""
}}
'''
    Path('/root/repo/src/main/scala/graft/ops/MmPins.scala').write_text(body)
    print('MmPins.scala written', len(body))
