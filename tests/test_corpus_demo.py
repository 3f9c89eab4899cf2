"""Guard for tools/corpus_demo.py: the timed end-to-end run over the
unregistered surface must keep producing a sane report at smoke scale."""

from __future__ import annotations


def test_corpus_demo_runs_at_smoke_scale(spark, tmp_path):
    # repo root is on sys.path via conftest; tools/ is a namespace package
    from tools.corpus_demo import run

    report = run(spark, "/root/testdata/sf0.001", str(tmp_path))
    assert report["metric"] == "corpus_demo_sec" and report["value"] > 0
    r = report["rows"]
    assert 0 < r["curated"] <= r["input"]
    assert 0 <= r["cls_positive"] <= r["curated"]
    # the LM fluency gate: a trained vocab and a non-empty head bucket
    assert r["lm_vocab"] > 0 and 0 < r["lm_head_bucket"] <= r["curated"]
    assert r["bpe_merges"] > 0 and r["sequences"] > 0
    assert r["train_tokens"] == r["sequences"] * report["params"]["seq_len"]
    assert r["mixed"] >= r["curated"] > 0  # the fixture recipe upsamples net
    assert r["wds_samples"] == r["curated"]  # one tar sample per curated doc
    # the r11 media leg: bounded fold, every selected doc decoded for real
    assert 0 < r["media_samples"] <= min(r["curated"], 512)
    # the r11 audio leg: every clip's stereo twin AND flac twin at hamming 0
    assert r["audiohash_twin_pairs"] == r["media_samples"]
    assert r["audiohash_flac_pairs"] == r["media_samples"]
    assert r["audio_twin_clips"] == r["media_samples"]
    # the r11 video leg: every clip samples exactly frames 0 and 2
    assert 0 < r["video_docs"] <= min(r["curated"], 64)
    assert r["video_frames"] == r["video_docs"] * 2
    # the census surveys every synthesized payload, none unknown; the
    # r12 arms: a progressive-JPEG re-encode of every PNG, and every
    # landed doc's text written as a real PDF (write_pdf → census pages);
    # the r13 arm: a 2-frame animated lossless WebP per PNG
    # (vp8l_enc.write_webp_anim → the census ANMF walk); the r14 arms:
    # every landed doc as a real legacy .doc (write_doc → the CFB+DOC
    # parse) and as an RFC 5322 message with its PNG attached
    # (write_eml → the strict mail parse)
    assert r["census_rows"] == 8 * r["media_samples"]
    # every 2-frame animation frame-samples through the ANMF compositor
    assert r["webp_anim_frames"] == 2 * r["media_samples"]
    expected_stages = {
        "profile", "quality_gate", "exact_dedup", "classifier_train_score",
        "lm_surprisal",
        "mixture_realize", "bpe_train", "bpe_pack_export", "verify_export",
        "wds_publish", "media_codecs", "audio_dedup_normalize",
        "video_framesample", "media_census", "zst_reingest",
    }
    assert set(report["stages"]) == expected_stages
