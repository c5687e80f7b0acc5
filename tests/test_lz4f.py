"""Pure-Python LZ4 frame codec (io/lz4f.py) — round-trip + spec cases.

The bag reader uses this for `rosbag record --lz4` chunks when the native
lz4 package is absent; correctness here is what makes real RELLIS-era bags
readable, so decode paths (overlapping matches, multi-block frames,
checksums, truncation) are pinned independently of the bag tests."""

import struct

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast inner-loop tier (see pyproject markers)

from gvom_tpu.io import lz4f


# xxHash32 reference vectors (published test vectors of the algorithm)
@pytest.mark.parametrize(
    "data,seed,want",
    [
        (b"", 0, 0x02CC5D05),
        (b"", 0x9E3779B1, 0x36B78AE7),
        (b"Hello World", 0, 0xB1FD16EE),
        # ≥16 bytes: exercises the 4-lane accumulator path
        (b"Nobody inspects the spammish repetition", 0, 0xE2293B2F),
    ],
)
def test_xxh32_vectors(data, seed, want):
    assert lz4f.xxh32(data, seed) == want


def test_block_round_trip_compressible():
    data = b"abcdefgh" * 500 + b"tail-literals"
    comp = lz4f.block_compress(data)
    assert len(comp) < len(data) // 4          # real matches were emitted
    assert lz4f.block_decompress(comp) == data


def test_block_overlapping_match():
    # offset 1 run: the classic RLE-via-overlap encoding
    data = b"x" + b"a" * 1000 + b"y" * 6
    comp = lz4f.block_compress(data)
    assert lz4f.block_decompress(comp) == data


def test_block_hand_built_overlap():
    # token: 1 literal, matchlen 15+... ; offset 1 → repeat 'z'
    blk = bytes([0x1F]) + b"z" + struct.pack("<H", 1) + bytes([10]) + bytes([0x50]) + b"abcde"
    out = lz4f.block_decompress(blk)
    assert out == b"z" * (1 + 15 + 4 + 10) + b"abcde"


@pytest.mark.parametrize("n", [0, 1, 11, 12, 13, 100, 65536, 300000])
def test_frame_round_trip_sizes(n):
    rng = np.random.default_rng(n)
    # half-compressible: random low-entropy bytes
    data = bytes(rng.integers(0, 4, size=n, dtype=np.uint8))
    assert lz4f.decompress(lz4f.compress(data)) == data


def test_frame_round_trip_incompressible():
    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 256, size=70000, dtype=np.uint8))
    frame = lz4f.compress(data, block_size_id=4)   # forces multi-block
    assert lz4f.decompress(frame) == data


def test_frame_fuzz_round_trip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(0, 5000))
        alphabet = int(rng.integers(2, 257))
        data = bytes(rng.integers(0, alphabet, size=n, dtype=np.uint8))
        assert lz4f.decompress(lz4f.compress(data)) == data


def test_frame_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        lz4f.decompress(b"\x00\x00\x00\x00rest")


def test_frame_descriptor_checksum_verified():
    frame = bytearray(lz4f.compress(b"hello world, hello world"))
    frame[6] ^= 0xFF                               # corrupt HC byte
    with pytest.raises(ValueError, match="descriptor checksum"):
        lz4f.decompress(bytes(frame))
    # and the escape hatch works
    assert lz4f.decompress(bytes(frame), verify_checksums=False) == b"hello world, hello world"


def test_frame_content_checksum_verified():
    data = b"payload " * 100
    frame = bytearray(lz4f.compress(data))
    frame[-1] ^= 0xFF                              # corrupt content checksum
    with pytest.raises(ValueError, match="content checksum"):
        lz4f.decompress(bytes(frame))


def test_truncated_block_rejected():
    blk = bytes([0xF0])                            # promises >=15 literals, has none
    with pytest.raises(ValueError):
        lz4f.block_decompress(blk)


def test_bad_offset_rejected():
    blk = bytes([0x04]) + struct.pack("<H", 9)     # offset beyond output
    with pytest.raises(ValueError, match="offset"):
        lz4f.block_decompress(blk)


def test_skippable_frame():
    skippable = struct.pack("<II", 0x184D2A50, 4) + b"junk"
    frame = lz4f.compress(b"real data")
    assert lz4f.decompress(skippable + frame) == b"real data"


def test_concatenated_frames():
    f = lz4f.compress(b"first|") + lz4f.compress(b"second")
    assert lz4f.decompress(f) == b"first|second"


def _linked_frame() -> bytes:
    """Hand-built two-block LINKED frame (FLG bit 5 clear — python-lz4 / lz4
    CLI default): block 2 is a single match whose offset reaches into block
    1's output (frame history)."""
    flg = 0x40                                     # version 1, linked blocks
    bd = 0x40                                      # 64 KB max block size
    desc = bytes([flg, bd])
    hc = (lz4f.xxh32(desc) >> 8) & 0xFF
    b1 = b"0123456789abcdef"
    b2 = bytes([0x04]) + struct.pack("<H", 16)     # match: 8 bytes from offset 16
    return (
        struct.pack("<I", 0x184D2204)
        + desc
        + bytes([hc])
        + struct.pack("<I", len(b1) | 0x80000000)  # uncompressed block 1
        + b1
        + struct.pack("<I", len(b2))
        + b2
        + struct.pack("<I", 0)                     # EndMark
    )


def test_linked_block_frame_decodes_against_history():
    assert lz4f.decompress(_linked_frame()) == b"0123456789abcdef" + b"01234567"


def test_block_decompress_history_overlap():
    # linked match longer than its offset: spans from history into own output
    blk = bytes([0x08]) + struct.pack("<H", 4)     # 12 bytes from offset 4
    out = lz4f.block_decompress(blk, history=b"abcd")
    assert out == b"abcdabcdabcd"
