"""Spark 4 Python Data Source API: a splittable mongoexport-JSONL
connector.

The reference's native interchange format is mongoexport extended JSON,
one document per line (SURVEY.md §2.1 S1). The engine already proves
the serialize→repair round trip through the builtin text machinery
(``ingest_extended_json_repair``); this module implements the format as
a CUSTOM CONNECTOR through ``pyspark.sql.datasource.DataSource`` — the
Spark 4 API for sources no JVM connector covers, which is exactly the
one place a row-at-a-time Python boundary is the idiomatic choice
(there is no JVM alternative to be slower than; the alternative is not
reading the format at all).

Scale design — byte-range splits, the Hadoop text-input discipline:
``partitions()`` plans N byte ranges over the file WITHOUT reading it
(one ``stat`` call); each reader task seeks to its range start,
discards the partial first line (unless at offset 0), then parses every
line whose FIRST byte lies inside its range, reading through the first
newline past the range end. Every line is owned by exactly one
partition with zero coordination, so a 1 TB export reads with
1000-way parallelism the same as this test file reads with 8.

Repair semantics match ``sources.ingest.repair_sale_date``: a document
carries ``saleDateRaw`` as either a bare ISO string (dirty) or a
``{"$date": iso}`` wrapper (clean); money arrives as
``{"$numberDecimal": "<2dp string>"}`` and parses via ``float(<str>)``
(correctly rounded — identical to the oracle's VARCHAR→DOUBLE cast).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

FORMAT_NAME = "p2bd_jsonl"

#: Output schema (DDL). sale_ts stays a STRING formatted exactly like
#: the oracle's strftime — timestamps never round-trip through a tz.
SCHEMA = ("sale_id string, sale_ts string, total_price double, "
          "purchase_method string")


class _ByteRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class JsonlSaleReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.n = int(options.get("num_partitions", "8"))

    def partitions(self):
        import os

        size = os.path.getsize(self.path)
        if size == 0:
            return [_ByteRange(0, 0)]
        step = max(1, size // self.n)
        bounds = list(range(0, size, step))
        return [
            _ByteRange(s, min(s + step, size))
            for s in bounds
            if s < size
        ]

    def read(self, part):
        import json

        with open(self.path, "rb") as fh:
            fh.seek(part.start)
            if part.start:
                fh.readline()  # partial line — owned by the previous range
            while True:
                pos = fh.tell()
                if pos >= part.end:
                    break
                line = fh.readline()
                if not line.strip():
                    continue
                d = json.loads(line)
                # saleDateRaw holds NESTED JSON TEXT: either a quoted
                # bare ISO ('"2000-03-15T00:00:00Z"', the dirty shape)
                # or an object-as-string ('{"$date": "..."}')
                raw = d["saleDateRaw"].strip()
                if raw.startswith("{"):
                    iso = json.loads(raw)["$date"]
                else:
                    iso = raw.strip('"')
                sale_ts = iso.replace("T", " ").rstrip("Z")
                yield (
                    d["_id"]["$oid"],
                    sale_ts,
                    float(d["price"]["$numberDecimal"]),
                    d["purchaseMethod"],
                )


class JsonlSaleDataSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return JsonlSaleReader(self.options)

    def simpleStreamReader(self, schema):
        return _make_stream_reader(self.options)


def register_jsonl_source(spark) -> None:
    """Idempotent format registration (latest registration wins)."""
    spark.dataSource.register(JsonlSaleDataSource)


def read_jsonl_sales(spark, path: str, num_partitions: int = 8):
    register_jsonl_source(spark)
    return (
        spark.read.format(FORMAT_NAME)
        .option("path", path)
        .option("num_partitions", str(num_partitions))
        .load()
    )


class JsonlSaleStreamReader:
    """Streaming half of the connector (``SimpleDataSourceStreamReader``):
    the export file replayed in ``batch_lines``-sized micro-batches with
    LINE-NUMBER offsets. ``read(start)`` serves the next window and
    advances the offset; ``readBetweenOffsets`` replays a committed
    window deterministically (the at-least-once recovery path Spark
    calls after a restart); a caught-up source returns an empty batch
    with an unchanged offset. Offsets are plain dicts, so the
    checkpoint's offset log is human-readable JSON."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_lines = int(options.get("batch_lines", "4000"))

    def initialOffset(self):
        # `line` is the human-readable progress marker; `byte` is the
        # seek position the next window starts from — without it every
        # read() re-scans the file from line 0 to skip to its window,
        # which is quadratic across a replay (measured: the K=100
        # export spent most of its 240 s in that skip loop)
        return {"line": 0, "byte": 0}

    def _parse(self, line: bytes):
        import json

        d = json.loads(line)
        raw = d["saleDateRaw"].strip()
        if raw.startswith("{"):
            iso = json.loads(raw)["$date"]
        else:
            iso = raw.strip('"')
        return (
            d["_id"]["$oid"],
            iso.replace("T", " ").rstrip("Z"),
            float(d["price"]["$numberDecimal"]),
            d["purchaseMethod"],
        )

    def _window(self, start_byte: int, max_lines: int | None,
                end_byte: int | None = None):
        # progress counts FILE LINES (blank ones included), not parsed
        # rows — a parsed-row delta would desync window boundaries on
        # any blank line; the byte position makes each window O(window)
        out, consumed = [], 0
        with open(self.path, "rb") as fh:
            fh.seek(start_byte)
            while True:
                if max_lines is not None and consumed >= max_lines:
                    break
                if end_byte is not None and fh.tell() >= end_byte:
                    break
                line = fh.readline()
                if not line:
                    break
                consumed += 1
                if line.strip():
                    out.append(self._parse(line))
            return out, consumed, fh.tell()

    def read(self, start):
        rows, consumed, pos = self._window(start["byte"], self.batch_lines)
        return iter(rows), {"line": start["line"] + consumed, "byte": pos}

    def readBetweenOffsets(self, start, end):
        rows, _, _ = self._window(start["byte"], None,
                                  end_byte=end["byte"])
        return iter(rows)

    def commit(self, end):
        pass  # the file is immutable; nothing to release


def _make_stream_reader(options):
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    # JsonlSaleStreamReader FIRST: the pyspark base class ships stub
    # methods that raise NotImplementedError, so it must lose the MRO
    class _Reader(JsonlSaleStreamReader, SimpleDataSourceStreamReader):
        def __init__(self):
            JsonlSaleStreamReader.__init__(self, options)

    return _Reader()


def stream_jsonl_sales(spark, path: str, batch_lines: int = 4000):
    register_jsonl_source(spark)
    return (
        spark.readStream.format(FORMAT_NAME)
        .option("path", path)
        .option("batch_lines", str(batch_lines))
        .load()
    )
