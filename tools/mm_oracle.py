"""Independent replication of the mm_* kernels over the SELF-BUILT
media fixture (driver-side tooling; see graft/ops/Media.scala PIXEL
SPEC). Pure-python integer math regenerates the authored pixels from
the LCG recurrence — it never decodes BMP/PNG — so a pin match proves
the engine's javax.imageio encode→decode round trip returns exactly
the authored pixels. Cross-checks engine output in /tmp/verify_out
when present; --emit rewrites MmPins.scala."""
import sys
from pathlib import Path

M = (1 << 64) - 1
W, H = 48, 32
N_IMAGES = 8
N_VIDEOS = 3
VIDEO_FRAMES = 6
AUDIO_SIZES = [12000, 8000, 20000]
A, C = 6364136223846793005, 1442695040888963407


def signed(h):
    h &= M
    return h - (1 << 64) if h >= (1 << 63) else h


class Lcg:
    def __init__(self, seed):
        self.x = seed & M

    def next(self):
        self.x = (self.x * A + C) & M
        return self.x


def pixels(i, reenc):
    g = Lcg(1000003 * (i + 1))
    px = []
    for _ in range(W * H):
        x = g.next()
        px.append(((x >> 40) & 0xff, (x >> 32) & 0xff, (x >> 24) & 0xff))
    if reenc:
        p = Lcg(7777777 * (i + 1))
        for k in range(len(px)):
            if ((p.next() >> 60) & 0xf) == 0:
                r, g_, b = px[k]
                px[k] = (r ^ 1, g_ ^ 1, b ^ 1)
    return px


def luma(px):
    return [(77 * r + 150 * g + 29 * b) >> 8 for r, g, b in px]


def thumbnail(lm, side):
    bw, bh = W // side, H // side
    out = []
    for ty in range(side):
        for tx in range(side):
            s = sum(lm[y * W + x]
                    for y in range(ty * bh, (ty + 1) * bh)
                    for x in range(tx * bw, (tx + 1) * bw))
            out.append(s // (bw * bh))
    return out


def ahash(lm):
    t = thumbnail(lm, 8)
    total = sum(t)
    return sum(1 << i for i in range(64) if t[i] * 64 > total)


def build_rows():
    decode_rows = []
    resize_rows = []
    for i in range(N_IMAGES):
        for ext, reenc in (('bmp', False), ('png', True)):
            name = f'img_{i:02d}.{ext}'
            lm = luma(pixels(i, reenc))
            # mm_decode: real dims + mean luma + rolling *31 luma hash
            rolling = 1125899906842597
            for v in lm:
                rolling = (rolling * 31 + v) & M
            decode_rows.append((name, W, H, sum(lm) // len(lm),
                                signed(rolling)))
            # mm_resize: 16x16 area-average thumbnail, *131 checksum
            c = 0
            for v in thumbnail(lm, 16):
                c = (c * 131 + v) & M
            resize_rows.append((name, 16, 16, 256, signed(c)))

    frame_rows = []
    for i in range(N_VIDEOS):
        for k in range(VIDEO_FRAMES):
            # animated-GIF frame: gray level ((x>>44)&0xf)*17; with
            # r=g=b=l the integer luma equals the level exactly
            g = Lcg(5550001 * (i + 1) + 1000003 * k)
            lm = [((g.next() >> 44) & 0xf) * 17 for _ in range(W * H)]
            rolling = 1125899906842597
            for v in lm:
                rolling = (rolling * 31 + v) & M
            frame_rows.append((f'vid_{i}.gif', k, W, H,
                               sum(lm) // len(lm), signed(rolling)))

    audio_rows = []
    for i, sz in enumerate(AUDIO_SIZES):
        g = Lcg(987654321 * (i + 1))
        pcm = []
        for _ in range(sz):
            v = (g.next() >> 48) & 0xffff
            pcm.append(v - 65536 if v >= 32768 else v)  # int16 two's complement
        win = 1000
        for off in range(0, sz, win):
            end = min(off + win, sz)
            abs_sum = sum(abs(s) for s in pcm[off:end])
            zc = sum(1 for j in range(off + 1, end)
                     if (pcm[j] >= 0) != (pcm[j - 1] >= 0))
            audio_rows.append((f'aud_{i}.wav', off // win, end - off,
                               abs_sum, zc))

    decode_rows.sort(key=lambda r: r[0])
    resize_rows.sort(key=lambda r: r[0])
    frame_rows.sort(key=lambda r: (r[0], r[1]))
    audio_rows.sort(key=lambda r: (r[0], r[1]))
    return decode_rows, resize_rows, frame_rows, audio_rows


def check(name, sql_cols, rows, order):
    try:
        import duckdb
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


# Script body guarded so `from mm_oracle import pixels, luma, ahash`
# (phash_oracle.py) stays a PURE import: unguarded, a sibling tool run
# with --emit would silently rewrite MmPins.scala as an import side
# effect.
if __name__ == '__main__':
    decode_rows, resize_rows, frame_rows, audio_rows = build_rows()
    check('mm_decode', 'file_name, width, height, mean_luma, luma_hash',
          decode_rows, 'file_name')
    check('mm_frames',
          'file_name, frame_idx, width, height, mean_luma, luma_hash',
          frame_rows, 'file_name, frame_idx')
    check('mm_resize', 'file_name, width, height, thumb_bytes, thumb_checksum',
          resize_rows, 'file_name')
    check('mm_audio', 'file_name, win_idx, n_samples, abs_sum, zero_crossings',
          audio_rows, 'file_name, win_idx')

if __name__ == '__main__' and '--emit' in sys.argv:
    out = {}
    vals = ',\n'.join(f"('{f}', {w}, {h}, {m}, {hh})"
                      for f, w, h, m, hh in decode_rows)
    out['mm_decode'] = (
        "SELECT file_name, width::INT AS width, height::INT AS height,"
        " mean_luma::BIGINT AS mean_luma, luma_hash::BIGINT AS luma_hash"
        " FROM (VALUES\n" + vals
        + ")\n t(file_name, width, height, mean_luma, luma_hash)"
        " ORDER BY file_name")
    vals = ',\n'.join(f"('{f}', {i}, {w}, {h}, {m}, {hh})"
                      for f, i, w, h, m, hh in frame_rows)
    out['mm_frames'] = (
        "SELECT file_name, frame_idx::BIGINT AS frame_idx,"
        " width::INT AS width, height::INT AS height,"
        " mean_luma::BIGINT AS mean_luma, luma_hash::BIGINT AS luma_hash"
        " FROM (VALUES\n" + vals
        + ")\n t(file_name, frame_idx, width, height, mean_luma, luma_hash)"
        " ORDER BY file_name, frame_idx")
    vals = ',\n'.join(f"('{f}', {w}, {hh}, {tb}, {c})"
                      for f, w, hh, tb, c in resize_rows)
    out['mm_resize'] = (
        "SELECT file_name, width::INT AS width, height::INT AS height,"
        " thumb_bytes::BIGINT AS thumb_bytes,"
        " thumb_checksum::BIGINT AS thumb_checksum FROM (VALUES\n" + vals
        + ")\n t(file_name, width, height, thumb_bytes, thumb_checksum)"
        " ORDER BY file_name")
    vals = ',\n'.join(f"('{f}', {w}, {n}, {a}, {z})"
                      for f, w, n, a, z in audio_rows)
    out['mm_audio'] = (
        "SELECT file_name, win_idx::BIGINT AS win_idx,"
        " n_samples::BIGINT AS n_samples, abs_sum::BIGINT AS abs_sum,"
        " zero_crossings::BIGINT AS zero_crossings FROM (VALUES\n" + vals
        + ")\n t(file_name, win_idx, n_samples, abs_sum, zero_crossings)"
        " ORDER BY file_name, win_idx")
    body = f'''package graft.ops

/** GENERATED pinned oracles for the mm_* kernels (tools/mm_oracle.py:
  * pure-python regeneration of the Media.scala PIXEL SPEC — no JVM
  * codec involved — cross-checked against engine output before
  * pinning). A match proves the javax.imageio encode→decode round
  * trip plus the luma/resample math end-to-end, independent of any
  * environment-owned bytes. */
object MmPins {{
  val mmDecode: String = """{out['mm_decode']}"""

  val mmFrames: String = """{out['mm_frames']}"""

  val mmResize: String = """{out['mm_resize']}"""

  val mmAudio: String = """{out['mm_audio']}"""
}}
'''
    Path('/root/repo/src/main/scala/graft/ops/MmPins.scala').write_text(body)
    print('MmPins.scala written', len(body))
