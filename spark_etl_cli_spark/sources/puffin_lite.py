"""Engine-free Puffin file codec + Iceberg v3 deletion-vector blobs.

Implements the PUBLIC Apache Iceberg Puffin spec
(https://iceberg.apache.org/puffin-spec/) and the v3 table spec's
``deletion-vector-v1`` blob (https://iceberg.apache.org/spec/#deletion-
vectors), so ``iceberg_lite`` can read and write format-version-3
tables whose row-level deletes are stored as deletion vectors:

- Puffin framing: ``Magic(PFA1) Blob... Footer`` where Footer =
  ``Magic FooterPayload(JSON) FooterPayloadSize(int32 LE) Flags(4B)
  Magic``; we always write uncompressed payloads (flags = 0), and on
  read decompress lz4-FRAME footers and lz4/zstd blobs (the spec's
  ``compression-codec`` blob property) via pyarrow's bundled codecs —
  engine-written Puffin files read back without the engine.
- FileMetadata JSON: ``{"blobs": [BlobMetadata...], "properties": {}}``
  with the spec's BlobMetadata fields (type, fields, snapshot-id,
  sequence-number, offset, length, properties).
- ``deletion-vector-v1`` blob layout (spec "Deletion vector serialization"):
  ``<len of magic+vector: int32 BE> <magic D1 D3 39 64>
  <64-bit roaring bitmap "portable" serialization>
  <crc32 of magic+vector: int32 BE>``.

The vector serialization is the same 64-bit RoaringBitmapArray
portable format the Delta protocol uses (the 4 magic bytes ARE the
little-endian rendering of Delta's magic 1681511377 — the v3 spec
chose the format for cross-format interop), so this module reuses the
pinned roaring codec in ``sources/dv_lite.py`` byte-for-byte. That
makes iceberg-v3 DV <-> delta DV conversion (sources/uniform.py) a
frame re-wrap, never a bitmap transcode.

Reference parity: the reference engine has no lakehouse DV surface at
all (its sources are values/csv/parquet/delta-by-jar, spark-etl-cli
``Sources.scala``); this module exists for the Spark-first lakehouse
maintenance story and is pinned by round-trip + corruption tests.
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"PFA1"
DV_BLOB_TYPE = "deletion-vector-v1"


def write_puffin(path: str, blobs: list[dict], properties: dict | None = None) -> list[dict]:
    """Write a Puffin file. Each blob dict: ``{"type": str, "data":
    bytes, "fields": [int...], "snapshot-id": int, "sequence-number":
    int, "properties": {str: str}}``. Returns the spec BlobMetadata
    dicts (with resolved ``offset``/``length``) in file order — the
    caller records these in manifests (content_offset /
    content_size_in_bytes for DVs)."""
    metas: list[dict] = []
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        offset = 4
        for b in blobs:
            data = b["data"]
            meta = {
                "type": b["type"],
                "fields": list(b.get("fields") or []),
                "snapshot-id": int(b.get("snapshot-id") or 0),
                "sequence-number": int(b.get("sequence-number") or 0),
                "offset": offset,
                "length": len(data),
            }
            if b.get("properties"):
                meta["properties"] = dict(b["properties"])
            fh.write(data)
            offset += len(data)
            metas.append(meta)
        payload = json.dumps(
            {"blobs": metas, "properties": dict(properties or {})}
        ).encode("utf-8")
        fh.write(MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(b"\x00\x00\x00\x00")  # flags: payload uncompressed
        fh.write(MAGIC)
    return metas


def read_puffin_metadata(path: str) -> dict:
    """Parse the footer -> FileMetadata dict (``blobs`` + ``properties``)."""
    with open(path, "rb") as fh:
        fh.seek(0)
        if fh.read(4) != MAGIC:
            raise ValueError(f"not a Puffin file (bad leading magic): {path}")
        fh.seek(-12, 2)
        tail = fh.read(12)
        if tail[8:] != MAGIC:
            raise ValueError(f"not a Puffin file (bad trailing magic): {path}")
        (payload_size,) = struct.unpack_from("<i", tail, 0)
        flags = tail[4:8]
        fh.seek(-(12 + payload_size + 4), 2)
        if fh.read(4) != MAGIC:
            raise ValueError(f"corrupt Puffin footer (bad footer magic): {path}")
        payload = fh.read(payload_size)
    if flags[0] & 0x01:
        # spec flag bit 0: footer payload is a single lz4 FRAME
        payload = _decompress("lz4", bytes(payload))
    return json.loads(payload.decode("utf-8"))


def _decompress(codec: str, data: bytes) -> bytes:
    """lz4(frame)/zstd via pyarrow's bundled codecs, import-gated."""
    try:
        import pyarrow as pa

        # streaming decompression: Puffin doesn't record decompressed
        # sizes, and pyarrow's one-shot Codec.decompress requires one
        with pa.CompressedInputStream(pa.BufferReader(data), codec) as st:
            return st.read()
    except ImportError as exc:  # pragma: no cover - pyarrow is baked in
        raise NotImplementedError(
            f"Puffin payload is {codec}-compressed and pyarrow is not "
            "importable to decompress it"
        ) from exc


def read_puffin_blob(
    path: str, offset: int, length: int, codec: str | None = None
) -> bytes:
    """Raw blob bytes; ``codec`` is the BlobMetadata
    ``compression-codec`` property (None/"" = uncompressed, else
    lz4 frame or zstd per the spec)."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        data = fh.read(length)
    if len(data) != length:
        raise ValueError(
            f"Puffin blob truncated: wanted {length} bytes at {offset}, "
            f"got {len(data)} ({path})"
        )
    if codec:
        if codec not in ("lz4", "zstd"):
            raise NotImplementedError(
                f"Puffin blob compression-codec {codec!r} (spec allows "
                "lz4/zstd)"
            )
        data = _decompress(codec, data)
    return data


# --------------------------------------------------------------------------
# deletion-vector-v1 blobs
# --------------------------------------------------------------------------

_DV_MAGIC = b"\xd1\xd39d"  # D1 D3 39 64 == struct.pack('<i', 1681511377)


def dv_blob_bytes(indexes: list[int]) -> bytes:
    """Serialize sorted row positions as one ``deletion-vector-v1``
    blob: length-prefixed magic+portable64 vector with a trailing
    CRC-32 (both big-endian per the v3 spec)."""
    from spark_etl_cli_spark.sources.dv_lite import serialize_bitmap_array

    data = serialize_bitmap_array(indexes)  # starts with the DV magic
    if data[:4] != _DV_MAGIC:
        raise AssertionError("roaring codec drifted from the DV magic")
    return (
        struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )


def parse_dv_blob(blob: bytes) -> list[int]:
    """``deletion-vector-v1`` blob -> sorted deleted row positions,
    validating the length prefix, magic, and CRC-32."""
    from spark_etl_cli_spark.sources.dv_lite import parse_bitmap_array

    (size,) = struct.unpack_from(">i", blob, 0)
    if size + 8 != len(blob):
        raise ValueError(
            f"deletion-vector blob length mismatch: prefix {size}, "
            f"blob holds {len(blob) - 8} vector bytes"
        )
    data = blob[4 : 4 + size]
    if data[:4] != _DV_MAGIC:
        raise ValueError("deletion-vector blob magic mismatch")
    (crc,) = struct.unpack_from(">I", blob, 4 + size)
    if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
        raise ValueError("deletion-vector blob CRC-32 mismatch")
    return parse_bitmap_array(data)


def read_dv(path: str, offset: int, length: int) -> list[int]:
    """Read one DV by its manifest coordinates (content_offset /
    content_size_in_bytes) -> sorted deleted positions."""
    return parse_dv_blob(read_puffin_blob(path, offset, length))
