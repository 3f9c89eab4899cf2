"""End-to-end timed corpus run over the UNREGISTERED training-data surface.

``bench.py`` measures the 189 registered queries; this tool measures the
round-10 pipeline components the registry cannot hold (array outputs,
trained artifacts): profile → quality gate → exact dedup → trained
classifier gate → mixture realization → BPE training → fixed-length
sequence packing → sharded parquet publication + verification → WebDataset
tar publication + byte audit → (round 11) a multimodal leg on the REAL
stdlib codecs: per-doc PNG synthesis/decode/NN-resize and WAV synthesis/
feature extraction, published as a WebDataset and round-tripped
byte-exactly — one real curation run, wall-clock per stage, so "the new
surface composes" is a measured statement, not a claimed one.

Prints ONE JSON line (the bench.py convention):
``{"metric": "corpus_demo_sec", "value": <total>, "unit": "sec",
"stages": {...}, "rows": {...}, "sf": ...}``.

Usage: ``python tools/corpus_demo.py [--sf-dir DIR] [--out DIR]``
(defaults: ``$SPARK_GRAFT_SF_DIR`` or sf0.1; a temp dir).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbase_observer_es_spark.io import table  # noqa: E402
from hbase_observer_es_spark.session import get_spark  # noqa: E402

MIN_TOKENS = 20  # quality floor (whitespace tokens)
NUM_MERGES = 2000
SEQ_LEN = 1024
N_SHARDS = 8
CLS_DIM = 2048
CLS_EPOCHS = 3
MEDIA_N = 512  # bounded media-synthesis fold (per-row codec work)


def run(spark, sf_dir: str, out: str) -> dict:
    from hbase_observer_es_spark.operators.bpe import train_bpe
    from hbase_observer_es_spark.operators.classifier import (
        classify,
        tokens_col,
        train_text_classifier,
    )
    from hbase_observer_es_spark.operators.dedup import q_dedup_exact
    from hbase_observer_es_spark.operators.mixture import (
        MIX_FACTORS,
        realize_mixture,
    )
    from hbase_observer_es_spark.operators.profile import profile_stats
    from hbase_observer_es_spark.operators.seqpack import (
        pack_training_sequences,
    )
    from hbase_observer_es_spark.operators.text import q_text_quality
    from hbase_observer_es_spark.sinks.dataset_export import (
        export_dataset,
        verify_export,
    )

    stages: dict[str, float] = {}
    rows: dict[str, int] = {}

    def stage(name: str, fn):
        t0 = time.monotonic()
        r = fn()
        stages[name] = round(time.monotonic() - t0, 3)
        return r

    docs = table(spark, sf_dir, "documents")
    rows["input"] = stage("profile", lambda: int(
        profile_stats(docs, ["doc_id", "text", "lang"])
        .where(F.col("col_name") == "doc_id")
        .head()["n_rows"]
    ))

    # every staged fn ends in an ACTION (parquet land or count), so each
    # stage's number is its own execution, not lazy plan-building billed
    # to whoever runs the plan first
    def gate():
        kept = (
            q_text_quality(spark, sf_dir)
            .where(F.col("n_tokens") >= MIN_TOKENS)
            .select("doc_id")
        )
        p = os.path.join(out, "gated.parquet")
        docs.join(kept, "doc_id").write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    gated = stage("quality_gate", gate)

    def dedup():
        survivors = q_dedup_exact(spark, sf_dir).select("doc_id")
        p = os.path.join(out, "curated.parquet")
        gated.join(survivors, "doc_id").write.mode("overwrite").parquet(p)
        c = spark.read.parquet(p)
        rows["curated"] = c.count()
        return c

    curated = stage("exact_dedup", dedup)
    rows_curated = rows["curated"]

    def cls_gate():
        labeled = curated.withColumn(
            "label",
            F.array_contains(tokens_col(F.col("text")), "join").cast("int"),
        )
        model = train_text_classifier(
            labeled, "label", dim=CLS_DIM, epochs=CLS_EPOCHS,
            max_samples=1_000_000,
        )
        return classify(curated, model).where(F.col("margin") > 0).count()

    rows["cls_positive"] = stage("classifier_train_score", cls_gate)

    def lm_gate():
        """The CCNet-shaped fluency stage (r13): train the integer-exact
        bigram LM on a deterministic reference slice (doc_id % 10 == 0 —
        the 'clean reference corpus' stand-in), score EVERY curated doc
        with the broadcast-join surprisal plan, and count the head
        bucket (mean surprisal below the reference median)."""
        from hbase_observer_es_spark.operators.ngramlm import (
            surprisal_frame,
            train_bigram_lm,
        )

        ref = curated.where(F.col("doc_id") % 10 == 0)
        model = train_bigram_lm(ref)
        scored = surprisal_frame(curated, model)
        cut = (
            surprisal_frame(ref, model)
            .where(F.col("n_bigrams") > 0)
            .agg(F.expr("percentile_approx(mean_surprisal_fp, 0.5, 100000)"))
            .head()[0]
        )
        rows["lm_vocab"] = model.vocab_size
        return scored.where(
            (F.col("n_bigrams") > 0) & (F.col("mean_surprisal_fp") <= cut)
        ).count()

    rows["lm_head_bucket"] = stage("lm_surprisal", lm_gate)

    def mix():
        mixed = realize_mixture(curated, MIX_FACTORS)
        # repeats become distinct packable rows via a (doc, rep) composite id
        m = (
            curated.join(mixed.select("doc_id", "rep_idx"), "doc_id")
            .withColumn(
                "mix_id",
                F.col("doc_id") * F.lit(1 << 8) + F.col("rep_idx"),
            )
        )
        p = os.path.join(out, "mixed.parquet")
        m.write.mode("overwrite").parquet(p)
        c = spark.read.parquet(p)
        rows["mixed"] = c.count()
        return c

    mixed = stage("mixture_realize", mix)

    merges = stage(
        "bpe_train",
        lambda: train_bpe(curated, num_merges=NUM_MERGES, min_word_count=1),
    )
    rows["bpe_merges"] = len(merges)

    def pack():
        seqs = pack_training_sequences(
            mixed, merges, seq_len=SEQ_LEN, n_shards=N_SHARDS, id_col="mix_id"
        ).withColumn(
            "seq_key",
            F.col("shard") * F.lit(1 << 32) + F.col("seq_id"),
        )
        return export_dataset(
            seqs, os.path.join(out, "packed"), key="seq_key", n_shards=N_SHARDS
        )

    manifest = stage("bpe_pack_export", pack)
    rows["sequences"] = int(manifest["total_rows"])
    rows["train_tokens"] = rows["sequences"] * SEQ_LEN

    stage(
        "verify_export",
        lambda: verify_export(spark, os.path.join(out, "packed")),
    )

    def wds_publish():
        from hbase_observer_es_spark.sinks.wds import verify_wds, write_wds

        p = os.path.join(out, "wds")
        pub = curated.select(
            F.format_string("doc-%09d", F.col("doc_id")).alias("key"),
            "text",
            F.to_json(F.struct("lang", "source", "n_chars")).alias("meta"),
        )
        m = write_wds(pub, p, {"text": "txt", "meta": "json"}, N_SHARDS, key_col="key")
        verify_wds(p)
        return int(m["total_samples"])

    rows["wds_samples"] = stage("wds_publish", wds_publish)

    def zst_reingest():
        """Round 15: re-compress the first published WDS shard as
        .tar.zst with an INDEPENDENT encoder (pyarrow's libzstd, the
        test-side-encoder convention) and ingest it back through
        tarsrc's member walk — which now decodes zstd through the
        repo's own from-spec RFC 8878 decoder. Pins 'the dataset-dump
        default compression composes with the pipeline' as a measured
        statement."""
        import pyarrow as pa

        from hbase_observer_es_spark.sources.tarsrc import read_tar_members

        shard = sorted(
            f for f in os.listdir(os.path.join(out, "wds")) if f.endswith(".tar")
        )[0]
        with open(os.path.join(out, "wds", shard), "rb") as f:
            raw = f.read()
        zp = os.path.join(out, "wds_zst")
        os.makedirs(zp, exist_ok=True)
        with open(os.path.join(zp, shard + ".zst"), "wb") as f:
            f.write(
                pa.Codec("zstd", compression_level=9).compress(raw, asbytes=True)
            )
        back = read_tar_members(spark, zp)
        n = int(back.count())
        # the shard's member bytes must survive the compress->decode trip
        import tarfile as _tf
        import io as _io

        want = sum(
            1
            for m in _tf.open(fileobj=_io.BytesIO(raw)).getmembers()
            if m.isfile() and m.size > 0
        )
        if n != want:
            raise AssertionError(
                f"zst re-ingest returned {n} members, shard holds {want}"
            )
        return n

    rows["zst_reingest_members"] = stage("zst_reingest", zst_reingest)

    def media():
        """The multimodal leg, on the ROUND-11 REAL codecs: synthesize a
        PNG image and a WAV clip per doc from its content bytes
        (executor-side, deterministic), decode + fit-to-224 NN-resize the
        actual pixels (operators/png.py), extract integer-exact audio
        features (operators/wav.py), publish the payloads as a
        WebDataset shard set, and re-read one round-trip sample byte-
        exactly. Bounded to MEDIA_N docs — media synth/codec work is
        per-row Python by nature; the Arrow batching is the scale shape."""
        import pandas as pd

        from hbase_observer_es_spark.operators.multimodal import (
            resize_image_real,
        )
        from hbase_observer_es_spark.operators.png import PngImage, encode_png
        from hbase_observer_es_spark.operators.wav import (
            parse_wav,
            wav_features,
        )
        from hbase_observer_es_spark.sinks.wds import (
            read_wds,
            verify_wds,
            write_wds,
        )

        def synth_and_extract(batches):
            import struct as _struct

            for pdf in batches:
                out_rows = {
                    k: []
                    for k in (
                        "doc_id", "png", "thumb", "wav", "img_w", "img_h",
                        "out_w", "out_h", "raw_crc32", "n_frames", "peak",
                        "zero_crossings",
                    )
                }
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    b = text.encode("utf-8")
                    if not b:  # the quality gate guarantees tokens; belt only
                        continue
                    side = max(8, min(64, int(len(b) ** 0.5) + 1))
                    raster = (b * ((side * side) // len(b) + 1))[: side * side]
                    png_payload = encode_png(
                        PngImage(side, side, 8, 0, 1, side, raster, None)
                    )
                    m = resize_image_real(png_payload, filter_mode=0)
                    pcm = _struct.pack(
                        f"<{len(b)}h", *((v - 128) * 256 for v in b)
                    )
                    wav_payload = (
                        b"RIFF"
                        + _struct.pack("<I", 36 + len(pcm))
                        + b"WAVEfmt "
                        + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                        + b"data"
                        + _struct.pack("<I", len(pcm))
                        + pcm
                    )
                    feats = wav_features(
                        parse_wav(wav_payload, origin=str(doc_id)),
                        origin=str(doc_id),
                    )
                    out_rows["doc_id"].append(doc_id)
                    out_rows["png"].append(png_payload)
                    out_rows["thumb"].append(m["payload"])
                    out_rows["wav"].append(wav_payload)
                    out_rows["img_w"].append(m["width"])
                    out_rows["img_h"].append(m["height"])
                    out_rows["out_w"].append(m["out_w"])
                    out_rows["out_h"].append(m["out_h"])
                    out_rows["raw_crc32"].append(m["raw_crc32"])
                    out_rows["n_frames"].append(feats["n_frames"])
                    out_rows["peak"].append(feats["peak"])
                    out_rows["zero_crossings"].append(feats["zero_crossings"])
                yield pd.DataFrame(out_rows)

        base = curated.select("doc_id", "text").orderBy("doc_id").limit(MEDIA_N)
        media_df = base.mapInPandas(
            synth_and_extract,
            "doc_id long, png binary, thumb binary, wav binary,"
            " img_w long, img_h long, out_w long, out_h long,"
            " raw_crc32 long, n_frames long, peak long, zero_crossings long",
        )
        p = os.path.join(out, "media.parquet")
        media_df.write.mode("overwrite").parquet(p)
        landed = spark.read.parquet(p)
        n = landed.count()
        wp = os.path.join(out, "wds_media")
        write_wds(
            landed.select(
                F.format_string("media-%09d", F.col("doc_id")).alias("key"),
                "png",
                "thumb",
                "wav",
                F.to_json(
                    F.struct("img_w", "img_h", "out_w", "out_h", "peak")
                ).alias("meta"),
            ),
            wp,
            # "thumbpng" not "thumb.png": this sink's extensions are
            # dot-free by contract (read_wds splits at the LAST dot)
            {"png": "png", "thumb": "thumbpng", "wav": "wav", "meta": "json"},
            4,
            key_col="key",
        )
        verify_wds(wp)
        # round-trip: the published PNG member is byte-identical to the
        # synthesized payload (WDS ships binary verbatim)
        first = landed.orderBy("doc_id").head()
        back = (
            read_wds(spark, wp)
            .where(
                (F.col("key") == F.format_string("media-%09d", F.lit(first["doc_id"])))
                & (F.col("ext") == "png")
            )
            .head()
        )
        assert bytes(back["content"]) == bytes(first["png"]), "WDS round-trip drift"
        from hbase_observer_es_spark.operators.png import decode_png

        thumb = decode_png(bytes(first["thumb"]))
        assert (thumb.width, thumb.height) == (first["out_w"], first["out_h"])
        # the multimodal dedup composition: hash original + thumbnail as
        # separate corpus entries; every (original, thumb) pair must land
        # at hamming 0 (224 = 28 x 8, so the thumb's 8x8 floor grid samples
        # exactly the original's) — the banded join finds all n of them
        from hbase_observer_es_spark.operators.imagehash import (
            image_hashes_frame,
            image_near_dups,
        )

        both = landed.select(
            (F.col("doc_id") * 2).alias("doc_id"), F.col("png").alias("payload")
        ).unionByName(
            landed.select(
                (F.col("doc_id") * 2 + 1).alias("doc_id"),
                F.col("thumb").alias("payload"),
            )
        )
        pairs = image_near_dups(image_hashes_frame(both))
        twin_pairs = pairs.where(
            (F.col("b_id") == F.col("a_id") + 1)
            & (F.col("a_id") % 2 == 0)
            & (F.col("hamming") == 0)
        ).count()
        rows["imagehash_twin_pairs"] = int(twin_pairs)
        assert twin_pairs == n, f"image near-dup recall {twin_pairs}/{n}"
        return n

    rows["media_samples"] = stage("media_codecs", media)

    def audio_leg():
        """The audio dedup + normalization composition on the clips the
        media stage landed: re-encode each WAV BOTH as a duplicated-
        channel stereo twin AND as a FLAC (different containers, byte-
        disjoint files), fingerprint all three sides
        (operators/audiohash.py — the fingerprint frame dispatches by
        payload magic), and require every (original, stereo) and
        (original, flac) pair at hamming 0 through the banded join —
        channel-count AND container invariance proved on real payloads.
        Then normalize the originals to mono 16-bit 16 kHz
        (operators/wav.py) and check the exact 2x frame count the
        integer resampler guarantees for 8 kHz input."""
        import pandas as pd

        from hbase_observer_es_spark.operators.audiohash import (
            audio_fingerprints_frame,
            audio_near_dups,
        )
        from hbase_observer_es_spark.operators.flac import encode_flac
        from hbase_observer_es_spark.operators.wav import (
            WavAudio,
            audio_normalize_frame,
            parse_wav,
            write_wav,
        )

        landed = spark.read.parquet(os.path.join(out, "media.parquet"))
        clips = landed.select("doc_id", F.col("wav").alias("payload"))

        def make_twins(batches):
            import struct as _struct

            for pdf in batches:
                ids, pays = [], []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    a = parse_wav(bytes(payload), origin=str(doc_id))
                    flat = a.samples()
                    inter = _struct.pack(
                        f"<{2 * len(flat)}h",
                        *(v for s in flat for v in (s, s)),
                    )
                    ids.append(doc_id * 3 + 1)
                    pays.append(
                        write_wav(
                            WavAudio(1, 2, a.sample_rate, 16, a.n_frames, inter)
                        )
                    )
                    ids.append(doc_id * 3 + 2)
                    pays.append(
                        encode_flac(flat, 1, a.sample_rate, 16, block_size=4096)
                    )
                yield pd.DataFrame({"doc_id": ids, "payload": pays})

        twins = clips.mapInPandas(make_twins, "doc_id long, payload binary")
        both = clips.select(
            (F.col("doc_id") * 3).alias("doc_id"), "payload"
        ).unionByName(twins)
        pairs = audio_near_dups(audio_fingerprints_frame(both))
        hits = (
            pairs.where(
                (F.col("a_id") % 3 == 0)
                & (F.col("b_id") - F.col("a_id")).isin(1, 2)
                & (F.col("hamming") == 0)
            )
            .groupBy((F.col("b_id") - F.col("a_id")).alias("kind"))
            .count()
            .collect()
        )
        counts = {r["kind"]: r["count"] for r in hits}
        n = clips.count()
        rows["audiohash_twin_pairs"] = int(counts.get(1, 0))
        rows["audiohash_flac_pairs"] = int(counts.get(2, 0))
        assert counts.get(1, 0) == n, f"stereo twin recall {counts}/{n}"
        assert counts.get(2, 0) == n, f"flac twin recall {counts}/{n}"

        norm = audio_normalize_frame(clips, rate=16000).select(
            "doc_id", F.col("n_frames").alias("norm_frames")
        )
        # 8 kHz in, 16 kHz out: the integer resampler emits exactly 2x frames
        bad = (
            norm.join(landed.select("doc_id", "n_frames"), "doc_id")
            .where(F.col("norm_frames") != F.col("n_frames") * 2)
            .count()
        )
        assert bad == 0, f"{bad} clips broke the exact 2x resample contract"
        return n

    rows["audio_twin_clips"] = stage("audio_dedup_normalize", audio_leg)

    VIDEO_N = 64  # loud cap: pure-Python JPEG per frame; recorded below

    def video_leg():
        """Real-video frame sampling on synthesized MJPEG AVIs: each of
        VIDEO_N docs becomes a 3-frame 16x16 clip (frames JPEG-encoded
        from the doc's bytes), written through write_avi_mjpeg, then
        sampled every-2nd through avi_frames_frame — container walk,
        JPEG decode, geometry/count validation, and exact rational
        timestamps all on the real byte formats."""
        import pandas as pd

        from hbase_observer_es_spark.operators.avi import (
            avi_frames_frame,
            write_avi_mjpeg,
        )
        from hbase_observer_es_spark.operators.jpeg import encode_jpeg
        from hbase_observer_es_spark.operators.png import PngImage

        base = curated.select("doc_id", "text").orderBy("doc_id").limit(VIDEO_N)

        def synth(batches):
            for pdf in batches:
                ids, pays = [], []
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    b = text.encode("utf-8") or b"x"
                    buf = b * ((256 + 17 * 2) // len(b) + 2)
                    frames = []
                    for k in range(3):
                        raw = bytes(buf[i + 17 * k] for i in range(256))
                        frames.append(
                            encode_jpeg(
                                PngImage(16, 16, 8, 0, 1, 16, raw, None),
                                quality=85,
                            )
                        )
                    ids.append(doc_id)
                    pays.append(write_avi_mjpeg(frames, 16, 16, scale=1, rate=25))
                yield pd.DataFrame({"doc_id": ids, "payload": pays})

        clips = base.mapInPandas(synth, "doc_id long, payload binary")
        sampled = avi_frames_frame(clips, every_n=2)
        agg = sampled.groupBy("doc_id").count().collect()
        n_docs = len(agg)
        assert all(r["count"] == 2 for r in agg), "expected frames 0 and 2 per clip"
        # frame 2 of a 25 fps clip sits at exactly 80000 us
        ts = sampled.where(F.col("frame_idx") == 2).select("ts_us").distinct().collect()
        assert [r.ts_us for r in ts] == [80000], ts
        rows["video_frames"] = int(n_docs * 2)
        return n_docs

    rows["video_docs"] = stage("video_framesample", video_leg)

    def census_leg():
        """The media census over the MIXED payload column this very run
        produced (PNGs + thumbnails + WAV clips + PROGRESSIVE JPEGs +
        PDFs + ANIMATED WEBPs stacked into one binary column): one pass
        classifies every payload by magic through the real parsers —
        the progressive arm (r12) re-encodes each landed PNG through
        encode_jpeg_progressive, and the animation arm (r13) writes a
        real 2-frame lossless WebP per PNG through the production VP8L
        encoder, so census geometry and frame counts come from the
        annex-G scan decoder and the ANMF walk, not a header peek.
        Family counts must reconcile exactly with what the media stage
        synthesized — nothing unknown, nothing erroring."""
        from hbase_observer_es_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )
        from hbase_observer_es_spark.operators.media_census import (
            media_census_frame,
        )
        from hbase_observer_es_spark.operators.pdf_text import write_pdf
        from hbase_observer_es_spark.operators.png import PngImage, decode_png
        from hbase_observer_es_spark.operators.vp8l_enc import write_webp_anim

        landed = spark.read.parquet(os.path.join(out, "media.parquet"))

        def to_pjpeg(batches):
            import pandas as pd  # worker-side: the driver alias is not shipped

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"] * 8 + 3,
                        "payload": [
                            encode_jpeg_progressive(
                                decode_png(bytes(p)), quality=85
                            )
                            for p in pdf["png"]
                        ],
                    }
                )

        def to_anim_webp(batches):
            """r13 arm: each landed PNG becomes a real 2-frame animated
            lossless WebP (frame 1 = the raster, frame 2 = its mirror)
            through the production encoder, so the census's animation
            row comes from the ANMF walk over bytes this run wrote."""
            import pandas as pd

            for pdf in batches:
                payloads = []
                for p in pdf["png"]:
                    img = decode_png(bytes(p))
                    # per-PIXEL mirror (channels-aware), not a byte
                    # reverse: a byte reverse of an RGB row would scramble
                    # the channel order and a width-byte slice would keep
                    # only the first third of the raster
                    if img.bit_depth != 8 or img.palette is not None:
                        raise ValueError(
                            "to_anim_webp: expected 8-bit non-palette "
                            f"landed PNGs, got depth={img.bit_depth} "
                            f"palette={img.palette is not None}"
                        )
                    n = img.channels
                    mirror = b"".join(
                        bytes(
                            b
                            for x in range(img.width - 1, -1, -1)
                            for b in img.raw[
                                y * img.stride + x * n
                                : y * img.stride + (x + 1) * n
                            ]
                        )
                        for y in range(img.height)
                    )
                    payloads.append(write_webp_anim([
                        (40, img),
                        (40, PngImage(img.width, img.height, 8,
                                      img.color_type, n,
                                      img.width * n, mirror, None)),
                    ]))
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"] * 8 + 5, "payload": payloads}
                )

        def to_pdf(batches):
            import pandas as pd

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"] * 8 + 4,
                        # cp1252-expressible by construction: the fixture
                        # corpus is ASCII (the q_mm_decode invariant)
                        "payload": [
                            write_pdf([t]) for t in pdf["text"]
                        ],
                    }
                )

        def to_doc(batches):
            """r14 arm: each landed doc's text as a real legacy .doc —
            FIB + piece table inside a real CFB container via the
            production writers, so the census's family=document/doc row
            comes from the full MS-CFB + MS-DOC parse over bytes this
            run wrote."""
            import pandas as pd

            from hbase_observer_es_spark.operators.doc_text import write_doc

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"] * 8 + 6,
                        "payload": [write_doc([t]) for t in pdf["text"]],
                    }
                )

        def to_eml(batches):
            """r14 arm: each landed doc becomes a real RFC 5322 message
            carrying its own PNG as a MIME attachment — the census's
            family=message row exercises header decode, MIME walk, and
            the strict charset path end to end."""
            import pandas as pd

            from hbase_observer_es_spark.sources.mailsrc import write_eml

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"] * 8 + 7,
                        "payload": [
                            write_eml(
                                "corpus@example.com",
                                "census@example.com",
                                f"doc {i}",
                                int(i) * 1_000_000,
                                t,
                                attachments=[(
                                    f"img{i}.png", "image/png", bytes(p)
                                )],
                            )
                            for i, t, p in zip(
                                pdf["doc_id"], pdf["text"], pdf["png"]
                            )
                        ],
                    }
                )

        # the PDF arm writes each landed doc's TEXT as a real PDF (the
        # join with landed doc_ids bounds it to the media fold)
        texts = curated.select("doc_id", "text")
        anim_webp = landed.select("doc_id", "png").mapInPandas(
            to_anim_webp, "doc_id long, payload binary")
        landed_texts = texts.join(landed.select("doc_id"), "doc_id")
        mixed = (
            landed.select((F.col("doc_id") * 8).alias("doc_id"),
                          F.col("png").alias("payload"))
            .unionByName(
                landed.select((F.col("doc_id") * 8 + 1).alias("doc_id"),
                              F.col("thumb").alias("payload")))
            .unionByName(
                landed.select((F.col("doc_id") * 8 + 2).alias("doc_id"),
                              F.col("wav").alias("payload")))
            .unionByName(
                landed.select("doc_id", "png").mapInPandas(
                    to_pjpeg, "doc_id long, payload binary"))
            .unionByName(
                landed_texts.mapInPandas(to_pdf, "doc_id long, payload binary"))
            .unionByName(anim_webp)
            .unionByName(
                landed_texts.mapInPandas(to_doc, "doc_id long, payload binary"))
            .unionByName(
                texts.join(landed.select("doc_id", "png"), "doc_id")
                .mapInPandas(to_eml, "doc_id long, payload binary"))
        )
        counts = {
            (r.family, r.format): r["count"]
            for r in media_census_frame(mixed)
            .groupBy("family", "format")
            .count()
            .collect()
        }
        n = landed.count()
        assert counts == {
            ("image", "png"): 2 * n,
            ("audio", "wav"): n,
            ("image", "jpeg"): n,
            ("document", "pdf"): n,
            # VP8X container → kind "extended"; n_frames rides the row
            ("image", "webp-extended"): n,
            # r14 arms: legacy .doc through the CFB walk, RFC 5322
            # messages (each carrying its PNG as a MIME attachment)
            ("document", "doc"): n,
            ("message", "eml"): n,
        }, counts
        rows["census_payloads"] = int(8 * n)
        # the animations also frame-SAMPLE for real: every ANMF frame
        # composes through webpanim and lands as a canvas-sized PNG row
        from hbase_observer_es_spark.operators.webpanim import (
            webp_frames_frame,
        )

        sampled = webp_frames_frame(anim_webp).groupBy("doc_id").count()
        bad = sampled.where(F.col("count") != 2).count()
        assert bad == 0, f"{bad} animations sampled != 2 frames"
        rows["webp_anim_frames"] = int(2 * sampled.count())
        return 8 * n

    rows["census_rows"] = stage("media_census", census_leg)

    assert rows_curated > 0 and rows["sequences"] > 0
    return {
        "metric": "corpus_demo_sec",
        "value": round(sum(stages.values()), 3),
        "unit": "sec",
        "stages": stages,
        "rows": rows,
        "sf": sf_dir,
        "params": {
            "min_tokens": MIN_TOKENS,
            "num_merges": NUM_MERGES,
            "seq_len": SEQ_LEN,
            "n_shards": N_SHARDS,
            "cls_dim": CLS_DIM,
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("corpus-demo", shuffle_partitions=int(cpus))
    try:
        out = args.out or tempfile.mkdtemp(prefix="corpus_demo_")
        print(json.dumps(run(spark, args.sf_dir, out)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
