"""Engine-free Hudi log-file (HoodieLogFormat) block codec.

MERGE_ON_READ tables buffer updates/deletes in ``.log`` files next to
the base parquet of each file group; the snapshot view merges them.
The block format is documented in the public Hudi tech spec
(https://hudi.apache.org/tech-specs/#log-format) and realized in
``HoodieLogFormatWriter`` / ``HoodieLogFileReader``; the reference repo
has no Hudi surface at all, so this module is a from-scratch
implementation of the published layout:

    MAGIC ``#HUDI#`` (6 bytes)
    block length          (8-byte big-endian: bytes after this field)
    log format version    (4-byte int, =1)
    block type            (4-byte int ordinal)
    header map            (4-byte count; per entry: 4-byte metadata
                           ordinal, 4-byte length, utf-8 bytes)
    content length        (8-byte)
    content
    footer map            (same encoding as header)
    total block length    (8-byte: MAGIC start -> block end, enabling
                           the spec's reverse traversal)

AVRO data block content: 4-byte content-format version (=3), 4-byte
record count, then per record a 4-byte length + Avro binary encoded
with the writer schema carried in the SCHEMA header (sources/avro_lite
does the record codec). DELETE block content uses the same
version+count+length-prefixed-avro framing over the fixed
``{recordKey, partitionPath}`` record. COMMAND (rollback) blocks have
empty content; their TARGET_INSTANT_TIME header names the instant whose
earlier blocks in the SAME log file must be ignored.

Fidelity caveat, stated honestly: the sandbox has no Hudi runtime to
interop-test against, so byte-level compatibility with every Hudi
release is pinned only by this module's own round-trip tests plus the
spec text — the same fence as kafka-lite's no-broker residue. The
merge SEMANTICS (latest record per key wins, deletes tombstone,
rollback invalidates a failed instant's blocks) are the documented
contract and are what the snapshot reader consumes.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Any

from spark_etl_cli_spark.sources.avro_lite import (
    Reader,
    make_decoder,
    make_encoder,
)

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1
CONTENT_FORMAT_VERSION = 3

# HoodieLogBlock.HoodieLogBlockType ordinals
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3

# HoodieLogBlock.HeaderMetadataType ordinals
INSTANT_TIME = 0
TARGET_INSTANT_TIME = 1
SCHEMA = 2
COMMAND_BLOCK_TYPE = 3

_DELETE_RECORD_SCHEMA: dict[str, Any] = {
    "type": "record",
    "name": "HoodieDeleteRecord",
    "fields": [
        {"name": "recordKey", "type": "string"},
        {"name": "partitionPath", "type": ["null", "string"]},
    ],
}


def _encode_meta_map(meta: dict[int, str]) -> bytes:
    out = io.BytesIO()
    out.write(struct.pack(">i", len(meta)))
    for ordinal, value in sorted(meta.items()):
        raw = value.encode("utf-8")
        out.write(struct.pack(">ii", ordinal, len(raw)))
        out.write(raw)
    return out.getvalue()


def _decode_meta_map(buf: io.BytesIO) -> dict[int, str]:
    (count,) = struct.unpack(">i", buf.read(4))
    out: dict[int, str] = {}
    for _ in range(count):
        ordinal, length = struct.unpack(">ii", buf.read(8))
        out[ordinal] = buf.read(length).decode("utf-8")
    return out


def _encode_records(records: list[dict], avro_schema: Any) -> bytes:
    enc = make_encoder(avro_schema)
    out = io.BytesIO()
    out.write(struct.pack(">ii", CONTENT_FORMAT_VERSION, len(records)))
    for rec in records:
        body = io.BytesIO()
        enc(body, rec)
        raw = body.getvalue()
        out.write(struct.pack(">i", len(raw)))
        out.write(raw)
    return out.getvalue()


def _decode_records(content: bytes, avro_schema: Any) -> list[dict]:
    dec = make_decoder(avro_schema)
    buf = io.BytesIO(content)
    _version, count = struct.unpack(">ii", buf.read(8))
    out = []
    for _ in range(count):
        (length,) = struct.unpack(">i", buf.read(4))
        out.append(dec(Reader(buf.read(length))))
    return out


def encode_block(
    block_type: int,
    header: dict[int, str],
    content: bytes,
    footer: dict[int, str] | None = None,
) -> bytes:
    """One on-disk log block (MAGIC through total-length trailer)."""
    hdr = _encode_meta_map(header)
    ftr = _encode_meta_map(footer or {})
    body = io.BytesIO()
    body.write(struct.pack(">ii", LOG_FORMAT_VERSION, block_type))
    body.write(hdr)
    body.write(struct.pack(">q", len(content)))
    body.write(content)
    body.write(ftr)
    payload = body.getvalue()
    # block length counts everything after itself, incl. the trailer
    block_len = len(payload) + 8
    total_len = len(MAGIC) + 8 + block_len
    return (
        MAGIC
        + struct.pack(">q", block_len)
        + payload
        + struct.pack(">q", total_len)
    )


def append_data_block(
    path: str,
    records: list[dict],
    avro_schema: Any,
    instant_time: str,
) -> None:
    """Append one AVRO data block (an upsert batch) to a log file."""
    content = _encode_records(records, avro_schema)
    header = {
        INSTANT_TIME: str(instant_time),
        SCHEMA: json.dumps(avro_schema),
    }
    with open(path, "ab") as fh:
        fh.write(encode_block(AVRO_DATA_BLOCK, header, content))


def append_delete_block(
    path: str,
    keys: list[tuple[str, str | None]],
    instant_time: str,
) -> None:
    """Append one DELETE block: ``keys`` = [(recordKey, partitionPath)]."""
    records = [{"recordKey": k, "partitionPath": p} for k, p in keys]
    content = _encode_records(records, _DELETE_RECORD_SCHEMA)
    header = {INSTANT_TIME: str(instant_time)}
    with open(path, "ab") as fh:
        fh.write(encode_block(DELETE_BLOCK, header, content))


def append_rollback_block(path: str, target_instant: str) -> None:
    """Append a COMMAND(rollback) block: every earlier block in THIS
    log file whose INSTANT_TIME equals ``target_instant`` is dead."""
    header = {
        INSTANT_TIME: str(target_instant),
        TARGET_INSTANT_TIME: str(target_instant),
        COMMAND_BLOCK_TYPE: "0",  # ROLLBACK_BLOCK
    }
    with open(path, "ab") as fh:
        fh.write(encode_block(COMMAND_BLOCK, header, b""))


def read_log_blocks(data: bytes) -> list[dict]:
    """Parse one log file's bytes into blocks, APPLYING rollback
    command blocks (scope: this file, per the spec).

    Returns ``[{"type", "header", "records"}]`` where ``records`` is
    decoded dicts for data blocks, ``{recordKey, partitionPath}`` dicts
    for delete blocks. A truncated trailing block (writer died
    mid-append) is dropped, matching the reader's corrupt-block
    skipping; garbage anywhere else raises.
    """
    blocks: list[dict] = []
    buf = io.BytesIO(data)
    size = len(data)
    while buf.tell() < size:
        start = buf.tell()
        magic = buf.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(
                f"hudi_log: bad magic {magic!r} at offset {start}"
            )
        raw_len = buf.read(8)
        if len(raw_len) < 8:
            break  # truncated mid-header: dead trailing block
        (block_len,) = struct.unpack(">q", raw_len)
        payload = buf.read(block_len)
        if len(payload) < block_len:
            break  # truncated mid-block: writer died; skip the tail
        body = io.BytesIO(payload)
        version, btype = struct.unpack(">ii", body.read(8))
        if version != LOG_FORMAT_VERSION:
            raise NotImplementedError(
                f"hudi_log: log format version {version} unsupported"
            )
        header = _decode_meta_map(body)
        (content_len,) = struct.unpack(">q", body.read(8))
        content = body.read(content_len)
        _footer = _decode_meta_map(body)
        (_total,) = struct.unpack(">q", body.read(8))
        if btype == COMMAND_BLOCK:
            target = header.get(TARGET_INSTANT_TIME)
            blocks = [
                b
                for b in blocks
                if b["header"].get(INSTANT_TIME) != target
            ]
            continue
        if btype == CORRUPT_BLOCK:
            continue
        if btype == AVRO_DATA_BLOCK:
            schema = json.loads(header[SCHEMA])
            records = _decode_records(content, schema)
        elif btype == DELETE_BLOCK:
            records = _decode_records(content, _DELETE_RECORD_SCHEMA)
        else:
            raise NotImplementedError(
                f"hudi_log: block type {btype} (hfile/parquet data "
                "blocks) needs the Hudi runtime"
            )
        blocks.append({"type": btype, "header": header, "records": records})
    return blocks
