"""CSV batch source/sink — the second raw-ingest interchange format.

Same contract as the JSONL source (`sources/jsonl.py`): EXPLICIT schema,
``FAILFAST`` parse mode, no inference, binary columns rejected, UTC
microsecond-exact timestamps. CSV-specific posture:

* **Quoting is always on** (QUOTE_ALL on write): a text column containing the
  delimiter, quotes, or leading zeros must survive byte-exactly; relying on
  minimal quoting makes the file's parseability depend on the DATA.
* **Embedded newlines are the scale trap.** A CSV row spanning lines forces
  ``multiLine=true`` on read, and a multiLine CSV file is NOT splittable —
  one task per file, no matter how big. Write-side this source REJECTS
  columns containing newlines loudly instead of silently producing a file
  that reads back single-threaded; the fixture corpus (single-line word
  soup) never trips it, and real pipelines should land such data as JSONL
  (splittable regardless of embedded newlines).
* **Null vs empty string is explicit.** CSV has no native null; the writer
  emits ``nullValue=\\N`` (the classic dump convention) so empty strings and
  nulls round-trip distinguishably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import apply_runtime_conf
from .jsonl import _TS_FORMAT, _reject_binary

_NULL = r"\N"


def write_csv(df: DataFrame, path: str) -> None:
    """Write a frame as quoted, headered CSV. Binary columns and embedded
    newlines are rejected (module docstring)."""
    _reject_binary(df.schema)
    string_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    if string_cols:
        pred = None
        for c in string_cols:
            has_nl = F.col(c).contains("\n") | F.col(c).contains("\r")
            pred = has_nl if pred is None else (pred | has_nl)
        bad = df.filter(pred).limit(1).count()
        if bad:
            raise ValueError(
                "CSV sink: a string column contains an embedded newline — the "
                "file would require a non-splittable multiLine read; land this "
                "data as JSONL instead (sources/jsonl.py)"
            )
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        .option("nullValue", _NULL)
        .option("timestampFormat", _TS_FORMAT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read headered CSV under an EXPLICIT schema, FAILFAST on malformed
    rows — the same loud ingest boundary as read_jsonl."""
    _reject_binary(schema)
    apply_runtime_conf(spark)
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .option("escape", '"')
        .option("nullValue", _NULL)
        .option("timestampFormat", _TS_FORMAT)
        .csv(path)
    )
