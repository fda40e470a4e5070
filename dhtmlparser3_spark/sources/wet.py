"""WET tier: the extraction pipeline's OUTPUT as Common Crawl ships it.

Common Crawl publishes three artifact families per snapshot: WARC (the
captures — ``sources/warc.py`` reads them), WAT (metadata), and **WET** —
the extracted plain text, which is exactly what this pipeline produces.
A WET file is structurally a WARC file whose payload records are
``WARC-Type: conversion`` with ``Content-Type: text/plain`` blocks of
UTF-8 text, one per source capture, led by a ``warcinfo`` record; the
on-disk layout is the same concatenated per-record gzip members
(``.warc.wet.gz``), so every boundary/offset/random-access property of
the WARC reader carries over verbatim.

``write_wet`` closes the Common Crawl loop: ``.warc.gz`` → ``read_warc``
→ ``extract_pages`` → ``write_wet`` reproduces the snapshot pipeline's
own shape, emitting shards a stock WET consumer (downstream LLM-data
tooling) can read.  ``read_wet`` is the matching reader — also the probe
that pins the round trip byte-identically.

Scale shape (same rules as the WARC reader, in reverse):

* one task writes ONE shard — the sink is ``mapInArrow`` over the
  extracted rows, so when chained after ``extract_pages`` the text is
  serialized in the SAME stage that produced it: extracted text never
  shuffles on its way to disk (repo rule: payload bytes cross stages
  never).  At 100 TB the upstream layout knob (``extract_pages``'s
  ``repartition=``/``maxPartitionBytes`` tiling) is also the shard-size
  knob.
* memory is O(one record): each record is built and gzip-compressed
  member-by-member straight to the file handle; nothing accumulates.
* output is committed ATOMICALLY per task: written to
  ``<name>.inprogress`` then ``os.rename``\\ d (posix rename is atomic),
  so a retried/speculated task never leaves a half shard that a glob
  would pick up.  The returned MANIFEST (one tiny row per shard: path,
  records, bytes) is the job-level commit record — a real pipeline
  writes it to its lineage table (``pipeline/lineage.py``) and treats
  only manifested shards as published, which makes the sink idempotent
  under whole-job retry as well.
* determinism: gzip ``mtime=0``, shard names derived from the task's
  partition id, record order = row order within the partition — the
  same input partitioning yields byte-identical shards (pinned).

Reference tie-in: the ``text`` each record carries is the byte-identical
``parse → content_str``-derived extraction the north star pins
(dhtmlparser3's own output per url, functions/extract.py); WET is
pipeline scope the reference never had — its serialization surface stops
at ``to_string``/``content_str`` on one document
(/root/reference/src/dhtmlparser3/tags/tag.py).
"""

from __future__ import annotations

import gzip
import os
import zlib
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .warc import (
    _CRLF2,
    _GZ_MAGIC,
    WarcStreamError,
    parse_warc_record,
    split_gzip_members,
    split_warc_plain,
    stream_gzip_extents,
    stream_gzip_members,
    stream_warc_plain,
    _local_path,
)


def _plain_extents(members):
    """(offset, raw) plain-record iterator → (offset, length, raw): an
    uncompressed record's on-disk extent IS its byte length."""
    for off, raw in members:
        yield off, len(raw), raw

# read_wet output: text is a STRING column (WET blocks are UTF-8 by
# format contract — the converter already transcoded at ingest), offsets
# and error policy identical to read_warc so WET shards are lineage-
# addressable the same way
WET_SCHEMA = (
    "src_file string, rec_offset bigint, url string, warc_date string, "
    "text string, error string"
)

# write_wet manifest: the tiny per-shard commit record
MANIFEST_SCHEMA = "path string, records bigint, bytes bigint"


def build_wet_record(
    url: str, date_iso: str, text: bytes, warc_type: str = "conversion"
) -> bytes:
    """One uncompressed WET record the way Common Crawl's converter writes
    it: ``conversion`` type, ``text/plain`` block.  ``text`` must already
    be UTF-8 bytes (the pipeline's html column is UTF-8 by the ingest
    contract, and extracted text is encoded here by the writer)."""
    if warc_type == "conversion":
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + b"WARC-Target-URI: %s\r\n" % url.encode()
            + b"WARC-Date: %s\r\n" % date_iso.encode()
            + b"Content-Type: text/plain\r\n"
            + b"Content-Length: %d\r\n" % len(text)
        )
    else:  # warcinfo lead
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            + b"WARC-Date: %s\r\n" % date_iso.encode()
            + b"Content-Type: application/warc-fields\r\n"
            + b"Content-Length: %d\r\n" % len(text)
        )
    return head + b"\r\n" + text + _CRLF2


_WARCINFO_BODY = b"software: dhtmlparser3_spark write_wet\r\nformat: WARC File Format 1.0\r\n"


def write_record_shard(
    path: str, lead: bytes, members: Iterator[bytes]
) -> Tuple[int, int]:
    """Stream pre-built WARC records into one per-record-gzip shard —
    leading ``lead`` record, O(one record) memory, atomic publish via
    rename.  Returns (record_count, byte_count); the count excludes the
    lead (it counts DOCUMENTS).  Shared by the WET and WAT sinks so the
    layout/atomicity contract cannot diverge."""
    tmp = path + ".inprogress"
    n = 0
    with open(tmp, "wb") as f:
        f.write(gzip.compress(lead, mtime=0))
        for m in members:
            f.write(gzip.compress(m, mtime=0))
            n += 1
        size = f.tell()
    os.replace(tmp, path)
    return n, size


def _write_shard(path: str, rows: Iterator[Tuple[str, str, str]]) -> Tuple[int, int]:
    """(url, date_iso, text) rows → one ``.warc.wet.gz`` shard."""
    lead = build_wet_record(
        "", "2024-01-01T00:00:00Z", _WARCINFO_BODY, "warcinfo"
    )
    return write_record_shard(
        path,
        lead,
        (
            build_wet_record(url, date_iso, text.encode("utf-8"))
            for url, date_iso, text in rows
        ),
    )


def write_wet(
    df: DataFrame,
    dest_dir: str,
    text_col: str = "extracted_text",
    prefix: str = "part",
) -> DataFrame:
    """Distributed WET sink: each input partition → one
    ``dest_dir/<prefix>-<pid:05d>.warc.wet.gz`` shard; returns the
    MANIFEST DataFrame ``(path, records, bytes)`` — an action on it (the
    caller's ``collect``/lineage write) runs the job.

    ``df`` needs ``url``, ``warc_ts`` (timestamp), and ``text_col``
    (string) — the ``extract_pages`` output shape by default.  NULL-text
    rows (extraction error rows) are skipped: WET carries conversions,
    not failures — the error rows stay in the extracted table where
    lineage already tracks them.

    Chained directly after ``extract_pages`` this adds ZERO exchanges —
    mapInArrow composes into the extract stage (pinned by
    test_wet_sink_plan_shape), so text goes scan → parse → shard file
    without ever crossing the cluster fabric.
    """
    os.makedirs(dest_dir, exist_ok=True)
    cols = df.select(
        F.col("url"),
        F.date_format(
            F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("wet_date"),
        F.col(text_col).alias("text"),
    )

    def run(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(dest_dir, f"{prefix}-{pid:05d}.warc.wet.gz")

        def rows():
            for rb in batches:
                urls = rb.column(rb.schema.get_field_index("url")).to_pylist()
                dates = rb.column(
                    rb.schema.get_field_index("wet_date")
                ).to_pylist()
                texts = rb.column(rb.schema.get_field_index("text")).to_pylist()
                for url, date, text in zip(urls, dates, texts):
                    if text is None:
                        continue
                    yield url, date or "1970-01-01T00:00:00Z", text

        n, size = _write_shard(path, rows())
        if n == 0:
            # an all-error/empty partition publishes no shard — remove the
            # empty (warcinfo-only) file so globs see only document shards
            os.remove(path)
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([path], pa.string()),
                pa.array([n], pa.int64()),
                pa.array([size], pa.int64()),
            ],
            ["path", "records", "bytes"],
        )

    return cols.mapInArrow(run, MANIFEST_SCHEMA)


def _iter_wet_rows(path: str, members: Iterator[Tuple[int, bytes]]):
    """Member iterator → WET_SCHEMA row tuples.  Same error policy as the
    WARC record loop (warc.py module docstring): malformed record → error
    row, scan continues; corrupt gzip member / plain-mode boundary loss →
    one error row, end THIS file.  Non-``conversion`` records (the
    warcinfo lead) skip by contract."""
    while True:
        try:
            off, raw = next(members)
        except StopIteration:
            return
        except (zlib.error, OSError) as e:
            yield (path, -1, None, None, None, f"gzip: {e}")
            return
        except WarcStreamError as e:
            yield (path, -1, None, None, None, f"warc: {e} (scan ended)")
            return
        try:
            wtype, url, date, block = parse_warc_record(raw)
        except ValueError as e:
            yield (path, off, None, None, None, f"warc: {e}")
            continue
        if wtype != "conversion":
            continue
        # WET blocks are UTF-8 text/plain by format contract; replace (not
        # raise) on violation — one mislabeled record must not cost a task
        yield (path, off, url, date, block.decode("utf-8", "replace"), None)


def start_wet_sink(
    pages_stream: DataFrame,
    dest_dir: str,
    checkpoint: str,
    available_now: bool = True,
    **extract_kwargs,
):
    """Streaming twin of the batch ``extract → write_wet`` composition:
    ``warc_pages_stream`` (arriving ``.warc.gz`` shards) → foreachBatch
    reusing the FULL batch extract job → WET shards per epoch.  Returns
    the started query.

    Exactly-once story: foreachBatch is AT-LEAST-ONCE (an epoch replays
    after a crash), but this sink is idempotent under replay — shard
    names are ``epoch-<id>-<pid>`` (epoch ids are checkpointed and never
    reused for new data), bytes are deterministic per input partition,
    and the atomic-rename publish means a replayed epoch overwrites its
    own shards with identical content rather than duplicating records.
    Composed end-to-end this is the streaming Common Crawl loop: a live
    crawl's WARC drop directory in, WET shards out, resumable at the
    checkpoint."""
    from dhtmlparser3_spark.pipeline.extract_job import extract_pages

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        ext = extract_pages(
            batch_df, with_metrics=False, **extract_kwargs
        ).select("url", "warc_ts", "extracted_text")
        write_wet(ext, dest_dir, prefix=f"epoch-{epoch_id:05d}").collect()

    writer = pages_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def scan_record_files(
    spark: SparkSession,
    path: str,
    io: str,
    make_rows,
    schema: str,
    arrow_types,
    batch_rows: int = 2048,
    extents: bool = False,
) -> DataFrame:
    """Generic WARC-layout record scan shared by the WET and WAT readers
    (and the CDX indexer): binaryFile over ``path`` (both on-disk layouts
    auto-detected per file), ``make_rows(path, member_iter)`` turning
    members into row tuples matching ``schema``/``arrow_types``, ``io``
    as in ``read_warc`` (``"stream"`` = path-only scan + incremental
    decompress, O(batch) worker memory).  An unopenable file in stream
    mode yields the row ``make_rows`` produces for an immediately-failing
    member iterator (the shared end-this-file policy).

    With ``extents=True`` the member iterator yields ``(offset, length,
    raw)`` instead of ``(offset, raw)`` — ``length`` is the record's
    on-disk byte extent (compressed gzip member / plain record bytes),
    the quantity a CDX index publishes for ranged fetches."""
    assert io in ("content", "stream"), io
    import pyarrow as pa

    fields = list(arrow_types)

    def _batched(row_iters):
        rows: list = []

        def _flush():
            rb = pa.RecordBatch.from_arrays(
                [
                    pa.array([r[i] for r in rows], arrow_types[k])
                    for i, k in enumerate(fields)
                ],
                fields,
            )
            rows.clear()
            return rb

        for it in row_iters:
            for row in it:
                rows.append(row)
                if len(rows) >= batch_rows:
                    yield _flush()
        if rows:
            yield _flush()

    def _failing(e):
        def gen():
            raise OSError(e)
            yield  # pragma: no cover

        return gen()

    def run_content(batches):
        def row_iters():
            for rb in batches:
                paths = rb.column(rb.schema.get_field_index("path")).to_pylist()
                contents = rb.column(
                    rb.schema.get_field_index("content")
                ).to_pylist()
                for p, data in zip(paths, contents):
                    data = bytes(data)
                    if extents:
                        import io as _io

                        members = (
                            stream_gzip_extents(_io.BytesIO(data))
                            if data[:2] == _GZ_MAGIC
                            else _plain_extents(split_warc_plain(data))
                        )
                    else:
                        members = (
                            split_gzip_members(data)
                            if data[:2] == _GZ_MAGIC
                            else split_warc_plain(data)
                        )
                    yield make_rows(p, members)

        yield from _batched(row_iters())

    def run_stream(batches):
        def row_iters():
            for rb in batches:
                for p in rb.column(
                    rb.schema.get_field_index("path")
                ).to_pylist():
                    try:
                        f = open(_local_path(p), "rb")
                    except OSError as e:
                        yield make_rows(p, _failing(str(e)))
                        continue
                    with f:
                        magic = f.read(2)
                        f.seek(0)
                        if extents:
                            members = (
                                stream_gzip_extents(f)
                                if magic == _GZ_MAGIC
                                else _plain_extents(stream_warc_plain(f))
                            )
                        else:
                            members = (
                                stream_gzip_members(f)
                                if magic == _GZ_MAGIC
                                else stream_warc_plain(f)
                            )
                        yield make_rows(p, members)

        yield from _batched(row_iters())

    files = spark.read.format("binaryFile").load(path)
    if io == "stream":
        return files.select("path").mapInArrow(run_stream, schema)
    return files.select("path", "content").mapInArrow(run_content, schema)


def read_wet(
    spark: SparkSession,
    path: str,
    batch_rows: int = 2048,
    io: str = "content",
) -> DataFrame:
    """WET file(s) → ``(src_file, rec_offset, url, wet_ts, text, error)``.

    Mirrors ``read_warc``: both on-disk layouts auto-detected per file
    (per-record gzip members / uncompressed), Hadoop globs accepted,
    ``io="stream"`` for O(batch) worker memory, ``(src_file, rec_offset)``
    the replayable lineage key, error rows per the shared policy."""
    import pyarrow as pa

    out_t = {
        "src_file": pa.string(),
        "rec_offset": pa.int64(),
        "url": pa.string(),
        "warc_date": pa.string(),
        "text": pa.string(),
        "error": pa.string(),
    }
    raw = scan_record_files(
        spark, path, io, _iter_wet_rows, WET_SCHEMA, out_t, batch_rows
    )
    return raw.select(
        "src_file",
        "rec_offset",
        "url",
        F.coalesce(
            F.try_to_timestamp(
                F.col("warc_date"), F.lit("yyyy-MM-dd'T'HH:mm:ssX")
            ),
            F.try_to_timestamp(
                F.col("warc_date"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSX")
            ),
        ).alias("wet_ts"),
        "text",
        "error",
    )
