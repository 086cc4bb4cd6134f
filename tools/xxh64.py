"""Pure-python XXH64 (public xxHash spec), matching Spark's
catalyst XXH64 (hashInt/hashLong specializations + byte-stream path).
Validated against pyspark's xxhash64() before use."""
M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def fmix(h):
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def hash_int(i, seed):
    # Spark XXH64.hashInt: 4-byte specialization
    h = (seed + P5 + 4) & M
    h ^= ((i & 0xFFFFFFFF) * P1) & M
    h = (rotl(h, 23) * P2 + P3) & M
    return fmix(h)


def hash_long(l, seed):
    h = (seed + P5 + 8) & M
    k = (rotl(((l & M) * P2) & M, 31) * P1) & M
    h ^= k
    h = (rotl(h, 27) * P1 + P4) & M
    return fmix(h)


def _round(acc, inp):
    acc = (acc + inp * P2) & M
    return (rotl(acc, 31) * P1) & M


def hash_bytes(b, seed):
    n = len(b)
    end = n
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while off <= n - 32:
            v1 = _round(v1, int.from_bytes(b[off:off + 8], 'little'))
            v2 = _round(v2, int.from_bytes(b[off + 8:off + 16], 'little'))
            v3 = _round(v3, int.from_bytes(b[off + 16:off + 24], 'little'))
            v4 = _round(v4, int.from_bytes(b[off + 24:off + 32], 'little'))
            off += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while off <= n - 8:
        k = _round(0, int.from_bytes(b[off:off + 8], 'little'))
        h ^= k
        h = (rotl(h, 27) * P1 + P4) & M
        off += 8
    if off <= n - 4:
        h ^= (int.from_bytes(b[off:off + 4], 'little') * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        off += 4
    while off < n:
        h ^= (b[off] * P5) & M
        h = (rotl(h, 11) * P1) & M
        off += 1
    return fmix(h)


def signed(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_str(s, seed=42):
    """Spark builtin xxhash64(string_col) with default seed."""
    return signed(hash_bytes(s.encode('utf-8'), seed & M))


def spark_xxhash64_long(l, seed=42):
    return signed(hash_long(l & M, seed & M))


if __name__ == '__main__':
    for s in ('hello', '', 'a', 'the quick brown fox', 'x' * 100):
        print(repr(s), spark_xxhash64_str(s))
    for l in (0, 1, -1, 123456789):
        print(l, spark_xxhash64_long(l))
