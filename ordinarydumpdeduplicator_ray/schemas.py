"""Fixed Arrow schemas for every logical table.

The reference's schema is class-defined and fixed (``Common/FsEntity.cs``,
``Common/BlobInfo.cs:13-16``, ``Common/FileState.cs:7-28``); here each
entity becomes a columnar table (see SURVEY.md §1.2 for the mapping).
Declared up front so stages can assert their outputs and checkpoints are
schema-stable across runs.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# input: Common-Crawl-style pages (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# row status — the reference's FileStatus enum (Common/FileStatus.cs:5-14)
# collapsed to the states observable on an immutable snapshot. `broken`
# corresponds to BrokenBlobInfo/Unreadable (Common/BlobInfo.cs:52-55),
# `empty` to EmptyBlobInfo (Common/BlobInfo.cs:44-51).
STATUS_OK = "ok"
STATUS_EMPTY = "empty"
STATUS_BROKEN = "broken"

# ---------------------------------------------------------------------------
# signatures — per-url content identity + similarity sketches
# (reference BlobInfo = (size, digest), Common/BlobInfo.cs:143-164,
#  extended with minhash/simhash per the north rule)
# ---------------------------------------------------------------------------
SIGNATURES = pa.schema(
    [
        ("url", pa.string()),
        ("content_sha256", pa.binary()),          # null when status=broken
        ("text_sha256", pa.binary()),             # hash of extracted text
        ("n_bytes", pa.int64()),                  # extracted-text byte length
        ("n_tokens", pa.int64()),
        ("status", pa.string()),                  # ok | empty | broken
        # K uint64 minhash values packed little-endian into 8*K bytes —
        # binary (not list<uint64>) so the column can ride through the
        # hash-shuffle join as a payload (Acero rejects list payloads);
        # unpack with np.frombuffer(buf, dtype="<u8").
        ("minhash", pa.binary()),                 # null if no shingles / not ok
        ("simhash", pa.uint64()),                 # null if no shingles / not ok
    ]
)

# candidate/verified duplicate pairs; url_a < url_b canonical order
EDGES = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("source", pa.string()),                  # exact | minhash | simhash
        ("jaccard", pa.float64()),                # 1.0 for exact
    ]
)

COMPONENTS = pa.schema(
    [
        ("url", pa.string()),
        ("component_id", pa.string()),            # min url in the component
    ]
)

# groups — the reference's SameContentFilesInfo analogue
# (aggregates per SameContentFilesInfo.cs:34-68; only n_copies > 1 per
#  DataControllerSimple.cs:288-301)
GROUPS = pa.schema(
    [
        ("group_key", pa.string()),
        ("n_copies", pa.int64()),
        ("n_bytes", pa.int64()),                  # size of the canonical copy
        ("all_data_size", pa.int64()),            # n_bytes * n_copies
        ("dup_data_size", pa.int64()),            # n_bytes * max(n_copies-1, 0)
        ("canonical_url", pa.string()),
        ("urls", pa.list_(pa.string())),
    ]
)

SPANS = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("a_start", pa.int64()),                  # word offsets in a's token stream
        ("a_end", pa.int64()),
        ("b_start", pa.int64()),
        ("b_end", pa.int64()),
        ("n_words", pa.int64()),
    ]
)

ACTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("action", pa.string()),                  # keep | isolate | delete
        ("group_key", pa.string()),
    ]
)

ACTION_KEEP = "keep"
ACTION_ISOLATE = "isolate"
ACTION_DELETE = "delete"
