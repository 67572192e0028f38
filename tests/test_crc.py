import numpy as np

from bzip2_tpu import crc


def test_crc_matches_bitwise_model(rng):
    for n in [0, 1, 7, 8, 9, 255, 1024]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert crc.crc32(data) == crc.crc32_slow(data)


def test_incremental_matches_oneshot(rng):
    data = rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes()
    c = crc.CRC32()
    for i in range(0, len(data), 997):
        c.update(data[i:i + 997])
    assert c.digest() == crc.crc32(data)


def test_update_repeated(rng):
    c = crc.CRC32()
    c.update_repeated(0xAB, 100_001)
    assert c.digest() == crc.crc32(b"\xab" * 100_001)


def test_combined_fold():
    # combined = rotl1(combined) ^ block, starting at 0
    crcs = [0xDEADBEEF, 0x12345678, 0xFFFFFFFF]
    c = 0
    for b in crcs:
        c = (((c << 1) | (c >> 31)) & 0xFFFFFFFF) ^ b
    assert crc.combine_block_crcs(crcs) == c
