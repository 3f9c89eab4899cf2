"""Tar archive ingest — the OTHER dataset-dump container, one task per
archive.

Research datasets ship as ``.tar`` / ``.tar.gz`` / ``.tgz`` / ``.tar.bz2``
/ ``.tar.xz`` at least as often as ZIP (ImageNet, LAION shards, most
academic releases), and WebDataset itself is tar-shaped — this source is
the ``sources/zipsrc.py`` contract on the tar container: load archives
via the ``binaryFile`` datasource, explode members inside
``mapInPandas`` (Arrow-batched, one task per archive, members never
touch the driver), parsed by the stdlib ``tarfile`` module (the
``sinks/wds.py`` precedent — stdlib container codecs are in-bounds).

Same guarantees as zipsrc:

* fail-loud: a corrupt archive names itself and the failing member;
  compression is sniffed by ``tarfile`` (``r:*``), an unreadable stream
  is a loud ValueError, never a silent empty frame;
* bomb-guarded: the SAME per-member and per-archive decompressed-byte
  budgets (``zipsrc.MAX_MEMBER_BYTES`` / ``MAX_ARCHIVE_BYTES``) — tar
  headers are attacker data and a gzip layer hides the true size;
  a member whose stream yields a different size than its header
  declares is loud;
* deterministic member order (archive order);
* directories, zero-byte placeholders, and the non-file member kinds
  (symlinks/hardlinks/devices/FIFOs — escape vectors in an ingest, not
  data) are skipped;
* sparse members materialize through tarfile's sparse handling and are
  size-checked like every other member.

``read_tar_members`` lands (archive, member, size, content) rows —
byte-compatible with ``read_zip_members`` so downstream stages take
either container; ``tar_texts_to_documents`` is the corpus-shaped
convenience with the same strict-UTF-8 discipline.

Scale posture: one task per archive is the right grain for the common
many-shards layout (WebDataset-style); a single huge tar.gz does not
parallelize (gzip is not splittable) — re-shard upstream, same note as
zipsrc.

Reference parity: none — builder-brief ingest surface (SURVEY §2-D's
source family).
"""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_conf
from .zipsrc import MAX_ARCHIVE_BYTES, MAX_MEMBER_BYTES, ZIP_MEMBER_SCHEMA

TAR_MEMBER_SCHEMA = ZIP_MEMBER_SCHEMA  # same landing shape, by design


def _iter_members(payload: bytes, origin: str, member_glob: str | None = None):
    import fnmatch

    try:
        tf = tarfile.open(fileobj=io.BytesIO(payload), mode="r:*")
    except tarfile.TarError as exc:
        raise ValueError(
            f"tar {origin}: not a readable tar archive: {exc}"
        ) from exc
    total = 0
    with tf:
        while True:
            try:
                info = tf.next()
            except tarfile.TarError as exc:
                raise ValueError(
                    f"tar {origin}: corrupt member header: {exc}"
                ) from exc
            if info is None:
                break
            if not info.isfile() or info.size == 0:
                continue  # dirs, links, devices, placeholders: not data
            if member_glob and not fnmatch.fnmatchcase(info.name, member_glob):
                continue
            if info.size > MAX_MEMBER_BYTES:
                raise ValueError(
                    f"tar {origin}: member {info.name!r} declares "
                    f"{info.size} bytes — over the {MAX_MEMBER_BYTES} "
                    "member guard; split the member or raise the guard"
                )
            total += info.size
            if total > MAX_ARCHIVE_BYTES:
                raise ValueError(
                    f"tar {origin}: archive decompresses past the "
                    f"{MAX_ARCHIVE_BYTES}-byte guard — shard the archive "
                    "or raise the guard"
                )
            try:
                f = tf.extractfile(info)
                content = f.read() if f is not None else None
            except Exception as exc:
                raise ValueError(
                    f"tar {origin}: member {info.name!r} failed to "
                    f"extract: {exc}"
                ) from exc
            if content is None:
                continue  # non-regular member tarfile cannot open
            if len(content) != info.size:
                raise ValueError(
                    f"tar {origin}: member {info.name!r} extracted "
                    f"{len(content)} bytes but declared {info.size}"
                )
            yield info.name, content


def read_tar_members(
    spark: SparkSession,
    path: str,
    glob: str = "*.tar*",
    member_glob: str | None = None,
) -> DataFrame:
    """(archive, member, size, content) per regular-file member, one
    task per archive; compression auto-sniffed per archive. The landing
    schema is byte-identical to ``read_zip_members`` so a mixed dump of
    tars and zips unions into one frame."""
    apply_runtime_conf(spark)
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"archive": [], "member": [], "size": [], "content": []}
            for p, payload in zip(pdf["path"], pdf["content"]):
                for name, content in _iter_members(bytes(payload), p, member_glob):
                    rows["archive"].append(p)
                    rows["member"].append(name)
                    rows["size"].append(len(content))
                    rows["content"].append(content)
            yield pd.DataFrame(rows)

    return binary.mapInPandas(explode, schema=TAR_MEMBER_SCHEMA)


def tar_texts_to_documents(
    spark: SparkSession,
    path: str,
    glob: str = "*.tar*",
    member_glob: str = "*.txt",
) -> DataFrame:
    """Text members → (uri, doc_uid, text) with the rawtext.py id
    convention and the zipsrc strict-UTF-8 discipline (mojibake is a
    loud member-naming error, never silently folded in)."""
    members = read_tar_members(spark, path, glob, member_glob)

    def decode_strict(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"uri": [], "text": []}
            for p, name, content in zip(
                pdf["archive"], pdf["member"], pdf["content"]
            ):
                try:
                    text = bytes(content).decode("utf-8")
                except UnicodeDecodeError as exc:
                    raise ValueError(
                        f"tar {p}: member {name!r} is not valid UTF-8 "
                        f"({exc}) — mojibake must be visible, not "
                        "folded in"
                    ) from exc
                rows["uri"].append(f"{p}!{name}")
                rows["text"].append(text)
            yield pd.DataFrame(rows)

    return members.mapInPandas(decode_strict, "uri string, text string").select(
        "uri",
        F.xxhash64(F.col("uri")).alias("doc_uid"),
        "text",
    )
