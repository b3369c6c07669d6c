"""Engine-free Delta deletion-vector decoding (read side).

Implements the public Delta protocol's Deletion Vector format
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md,
"Deletion Vectors" + "Deletion Vector Format"), so ``delta_lite`` can
read tables where rows were deleted in-place by modern engines without
rewriting data files:

- Z85 (RFC 32/ZeroMQ base85) codec — used for both the inline DV form
  and the UUID in the relative-path form;
- the 64-bit ``RoaringBitmapArray`` "portable" serialization (magic
  1681511377): a sequence of (high-32-bits key, standard 32-bit
  roaring bitmap) pairs;
- the standard 32-bit Roaring portable format (RoaringFormatSpec):
  array, bitmap, and run containers, both the 12346 (no-run) and
  12347 (with-run) cookies;
- the on-disk DV file framing: 1-byte format version, then per-DV
  ``<size: int32 BE><bitmap data><crc32: int32 BE>`` at the action's
  ``offset``.

Everything is stdlib-only, mirroring ``avro_lite``/``delta_lite``.
The decoder returns plain sorted row indexes; ``delta_lite`` joins
them against parquet's ``_metadata.row_index`` to drop deleted rows.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

# --------------------------------------------------------------------------
# Z85 (ZeroMQ base85): 4 bytes <-> 5 chars
# --------------------------------------------------------------------------

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 encodes only multiples of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            n, rem = divmod(n, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 decodes only multiples of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            n = n * 85 + _Z85_INDEX[c]
        out += n.to_bytes(4, "big")
    return bytes(out)


# --------------------------------------------------------------------------
# 32-bit Roaring portable format
# --------------------------------------------------------------------------

_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUNCONTAINER = 12346
_NO_OFFSET_THRESHOLD = 4


def parse_roaring32(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Parse one 32-bit roaring bitmap; returns (sorted values, end pos)."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        n_flag_bytes = (size + 7) // 8
        run_flags = buf[pos : pos + n_flag_bytes]
        pos += n_flag_bytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUNCONTAINER:
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        run_flags = b"\x00" * ((size + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    keys_cards = []
    for _ in range(size):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * size  # container offsets — sequential parse ignores them
    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length_m1 + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
    return values, pos


def serialize_roaring32(values: list[int]) -> bytes:
    """Serialize sorted uint32 values in the no-run (12346) format —
    array containers for card <= 4096, bitmap containers above."""
    containers: dict[int, list[int]] = {}
    for v in sorted(values):
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<i", _SERIAL_COOKIE_NO_RUNCONTAINER)
    out += struct.pack("<i", len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offsets header (required for the 12346 cookie)
    blobs = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= 4096:
            blobs.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            blobs.append(struct.pack("<1024Q", *words))
    offset = len(out) + 4 * len(keys)
    for blob in blobs:
        out += struct.pack("<I", offset)
        offset += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)


# --------------------------------------------------------------------------
# 64-bit RoaringBitmapArray ("portable", magic 1681511377)
# --------------------------------------------------------------------------

_MAGIC = 1681511377


def parse_bitmap_array(data: bytes) -> list[int]:
    """Parse the portable 64-bit format -> sorted row indexes."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = parse_roaring32(data, pos)
        base = key << 32
        out.extend(base + v for v in vals)
    return out


def serialize_bitmap_array(indexes: list[int]) -> bytes:
    groups: dict[int, list[int]] = {}
    for v in sorted(indexes):
        groups.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray()
    out += struct.pack("<i", _MAGIC)
    out += struct.pack("<q", len(groups))
    for key in sorted(groups):
        out += struct.pack("<i", key)
        out += serialize_roaring32(groups[key])
    return bytes(out)


# --------------------------------------------------------------------------
# DV descriptor resolution (the add.deletionVector action)
# --------------------------------------------------------------------------


def dv_file_path(table_path: str, path_or_inline: str) -> str:
    """storageType "u": ``[<prefix>]<20-char z85 uuid>`` →
    ``<table>/[<prefix>/]deletion_vector_<uuid>.bin``."""
    prefix, encoded = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(encoded))
    parts = [table_path]
    if prefix:
        parts.append(prefix)
    return os.path.join(*parts, f"deletion_vector_{u}.bin")


def read_deletion_vector(table_path: str, dv: dict) -> list[int]:
    """Resolve one ``add.deletionVector`` descriptor to row indexes."""
    storage = dv["storageType"]
    if storage == "i":
        data = z85_decode(dv["pathOrInlineDv"])
        return parse_bitmap_array(data)
    if storage == "u":
        path = dv_file_path(table_path, dv["pathOrInlineDv"])
    elif storage == "p":
        path = dv["pathOrInlineDv"]
        if path.startswith("file:"):
            path = path[len("file:") :]
    else:
        raise ValueError(f"unknown deletionVector storageType {storage!r}")
    offset = int(dv.get("offset", 1))
    with open(path, "rb") as fh:
        blob = fh.read()
    if blob[0] != 1:
        raise ValueError(f"unsupported DV file format version {blob[0]}")
    (size,) = struct.unpack_from(">i", blob, offset)
    data = blob[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, offset + 4 + size)
    if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
        raise ValueError("deletion vector checksum mismatch")
    return parse_bitmap_array(data)


def write_deletion_vector_file(path: str, indexes: list[int]) -> dict:
    """Test/tooling helper: write a single-DV file in the on-disk
    framing and return the matching descriptor fields (offset/size)."""
    data = serialize_bitmap_array(indexes)
    with open(path, "wb") as fh:
        fh.write(b"\x01")  # format version
        fh.write(struct.pack(">i", len(data)))
        fh.write(data)
        fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return {"offset": 1, "sizeInBytes": len(data), "cardinality": len(indexes)}
