"""Tests for the data pipeline: processing, interleaving, bucketing, prefetch,
and the on-device audio ops (z-norm, augmentation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coral_tpu.audio.augment import AugmentConfig, augment_batch, peak_normalize
from coral_tpu.audio.features import znorm
from coral_tpu.config import compose
from coral_tpu.data import BucketBatcher, interleave_iterables, prefetch_to_device
from coral_tpu.data.loading import load_data_for_finetuning
from coral_tpu.data.synthetic import make_synthetic_examples
from coral_tpu.text import CtcTokenizer

CHARS = "abcdefghijklmnopqrstuvwxyzæøå0123456789éü"


@pytest.fixture(scope="module")
def finetune_cfg(config_path):
    cfg = compose(
        "asr_finetuning",
        overrides=["model=test-wav2vec2", "datasets=test_dataset"],
        config_path=config_path,
    )
    # offline: synthetic sources, no val streams
    cfg.datasets.test_dataset.id = "synthetic://16"
    cfg.evaluation_datasets = []
    return cfg


class TestZnorm:
    def test_matches_hf_feature_extractor(self):
        from transformers import Wav2Vec2FeatureExtractor

        fe = Wav2Vec2FeatureExtractor(
            feature_size=1, sampling_rate=16_000, padding_value=0.0,
            do_normalize=True, return_attention_mask=True,
        )
        rng = np.random.default_rng(0)
        audio = rng.standard_normal(4000).astype(np.float32)
        theirs = fe(audio, sampling_rate=16_000).input_values[0]
        ours = znorm(jnp.asarray(audio)[None], jnp.asarray([4000]))[0]
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)

    def test_padding_stays_zero(self):
        rng = np.random.default_rng(1)
        audio = np.zeros((2, 1000), dtype=np.float32)
        audio[0, :800] = rng.standard_normal(800)
        audio[1] = rng.standard_normal(1000)
        out = np.asarray(znorm(jnp.asarray(audio), jnp.asarray([800, 1000])))
        assert np.all(out[0, 800:] == 0)
        assert abs(out[0, :800].mean()) < 1e-4
        assert abs(out[0, :800].std() - 1.0) < 1e-2


class TestAugment:
    def test_peak_normalize(self):
        x = jnp.asarray([[0.0, 0.5, -0.25], [0.0, 0.0, 0.0]])
        out = np.asarray(peak_normalize(x))
        assert out[0].max() == pytest.approx(1.0)
        assert np.all(out[1] == 0)

    def test_augment_batch_shapes_and_masking(self):
        rng = np.random.default_rng(0)
        audio = rng.standard_normal((4, 8000)).astype(np.float32)
        lengths = np.asarray([8000, 4000, 8000, 2000])
        noise_bank = rng.standard_normal((3, 16000)).astype(np.float32)
        out = augment_batch(
            jax.random.PRNGKey(0), jnp.asarray(audio), jnp.asarray(lengths),
            noise_bank=jnp.asarray(noise_bank),
        )
        out = np.asarray(out)
        assert out.shape == audio.shape
        assert np.all(np.isfinite(out))
        assert np.all(out[1, 4000:] == 0)  # padding preserved
        assert np.all(out[3, 2000:] == 0)

    def test_augment_is_random_but_seeded(self):
        rng = np.random.default_rng(2)
        audio = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
        lengths = jnp.asarray([4000, 4000])
        a = augment_batch(jax.random.PRNGKey(0), audio, lengths)
        b = augment_batch(jax.random.PRNGKey(0), audio, lengths)
        c = augment_batch(jax.random.PRNGKey(1), audio, lengths)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))

    def test_augment_jits(self):
        rng = np.random.default_rng(3)
        audio = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
        lengths = jnp.asarray([4000, 3000])
        jitted = jax.jit(augment_batch)
        out = jitted(jax.random.PRNGKey(0), audio, lengths)
        assert np.all(np.isfinite(np.asarray(out)))


class TestInterleave:
    def test_single_source_passthrough(self):
        out = list(interleave_iterables([lambda: iter(range(5))]))
        assert out == [0, 1, 2, 3, 4]

    def test_all_exhausted_oversamples(self):
        small = lambda: iter(["s1", "s2"])  # noqa: E731
        big = lambda: iter([f"b{i}" for i in range(20)])  # noqa: E731
        out = list(
            interleave_iterables([small, big], probabilities=[0.5, 0.5], seed=0)
        )
        # every source must be exhausted at least once
        assert out.count("s1") >= 1 and any(x.startswith("b") for x in out)
        smalls = [x for x in out if x.startswith("s")]
        assert len(smalls) > 2  # oversampled

    def test_probabilities_respected(self):
        a = lambda: iter(["a"] * 10_000)  # noqa: E731
        b = lambda: iter(["b"] * 10_000)  # noqa: E731
        out = list(
            interleave_iterables(
                [a, b], probabilities=[0.9, 0.1], seed=0,
                stopping_strategy="first_exhausted",
            )
        )
        frac_a = out.count("a") / len(out)
        assert 0.85 < frac_a < 0.95

    def test_deterministic(self):
        mk = lambda: iter(range(50))  # noqa: E731
        one = list(interleave_iterables([mk, mk], seed=7))
        two = list(interleave_iterables([mk, mk], seed=7))
        assert one == two


class TestBucketBatcher:
    def _samples(self, n=32, seed=0):
        rng = np.random.default_rng(seed)
        tok = CtcTokenizer.from_characters(CHARS)
        for i in range(n):
            seconds = rng.uniform(1.0, 9.5)
            text = "hej med dig nummer " + "i" * int(rng.integers(1, 20))
            yield {
                "audio_array": rng.standard_normal(
                    int(seconds * 16000)
                ).astype(np.float32),
                "labels": np.asarray(tok.encode(text), dtype=np.int32),
            }

    def test_fixed_shapes_per_bucket(self):
        batcher = BucketBatcher(
            batch_size=2, accum_steps=2, max_seconds=10.0, num_buckets=4,
            max_label_length=64,
        )
        shapes = set()
        count = 0
        for batch in batcher(self._samples(64)):
            assert batch["input_values"].shape[:2] == (2, 2)
            assert batch["labels"].shape == (2, 2, 64)
            shapes.add(batch["input_values"].shape[2])
            count += 1
            # audio fits its bucket and lengths are correct
            assert np.all(batch["input_lengths"] <= batch["input_values"].shape[2])
        assert count > 0
        assert shapes.issubset(set(batcher.bucket_lengths))
        assert len(shapes) > 1  # multiple buckets exercised

    def test_bucket_lengths_aligned(self):
        batcher = BucketBatcher(batch_size=2, max_seconds=10.0, num_buckets=4)
        for b in batcher.bucket_lengths:
            assert b % 1280 == 0
        assert batcher.bucket_lengths[-1] >= 10 * 16000

    def test_label_padding_is_minus_100(self):
        batcher = BucketBatcher(batch_size=4, accum_steps=1, max_label_length=32)
        batch = next(iter(batcher(self._samples(16))))
        labels = batch["labels"].reshape(-1, 32)
        lengths = batch["label_lengths"].reshape(-1)
        for row, n in zip(labels, lengths):
            assert np.all(row[n:] == -100)
            assert np.all(row[:n] >= 0)


class TestPrefetch:
    def test_order_and_completion(self):
        out = list(prefetch_to_device(iter(range(10)), lambda x: x * 2))
        assert out == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]

    def test_worker_error_propagates(self):
        def bad():
            yield 1
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            list(prefetch_to_device(bad(), lambda x: x))


class TestLoadDataForFinetuning:
    def test_synthetic_end_to_end(self, finetune_cfg):
        tok = CtcTokenizer.from_characters(CHARS)
        splits = load_data_for_finetuning(finetune_cfg, tok)
        assert "train" in splits
        samples = list(splits["train"]())
        assert len(samples) > 0
        s = samples[0]
        assert "audio_array" in s and "labels" in s
        assert s["audio_array"].dtype == np.float32
        assert s["text"] == s["text"].lower()
        # restartable: second call yields the same stream
        again = list(splits["train"]())
        assert len(again) == len(samples)
        np.testing.assert_array_equal(again[0]["labels"], samples[0]["labels"])

    def test_interleaved_two_synthetics(self, config_path):
        cfg = compose(
            "asr_finetuning",
            overrides=[
                "model=test-wav2vec2",
                "datasets=[test_dataset,fleurs]",
                "dataset_probabilities=[0.5,0.5]",
            ],
            config_path=config_path,
        )
        cfg.datasets.test_dataset.id = "synthetic://6"
        cfg.datasets.fleurs.id = "synthetic://6"
        cfg.datasets.fleurs.text_column = "text"
        cfg.evaluation_datasets = []
        tok = CtcTokenizer.from_characters(CHARS)
        splits = load_data_for_finetuning(cfg, tok)
        samples = list(splits["train"]())
        assert len(samples) >= 6

    def test_bad_probabilities_raise(self, config_path):
        cfg = compose(
            "asr_finetuning",
            overrides=[
                "model=test-wav2vec2",
                "datasets=[test_dataset,fleurs]",
                "dataset_probabilities=[0.5,0.2]",
            ],
            config_path=config_path,
        )
        cfg.datasets.test_dataset.id = "synthetic://4"
        cfg.datasets.fleurs.id = "synthetic://4"
        cfg.evaluation_datasets = []
        tok = CtcTokenizer.from_characters(CHARS)
        with pytest.raises(ValueError, match="sum to 1"):
            splits = load_data_for_finetuning(cfg, tok)
            list(splits["train"]())


def test_train_factory_reshuffles_per_epoch(config_path):
    from coral_tpu.config import compose
    from coral_tpu.data.loading import load_data_for_finetuning
    from coral_tpu.text.tokenizer import CtcTokenizer

    config = compose(
        "asr_finetuning",
        overrides=["model=test-wav2vec2", "datasets=[synthetic]",
                   "evaluation_datasets=[]", "max_seconds_per_example=5.0"],
        config_path=config_path,
    )
    tokenizer = CtcTokenizer.from_characters(config.model.characters_to_keep)
    splits = load_data_for_finetuning(config, tokenizer)
    epoch0 = [s["text"] for s in splits["train"](0)]
    epoch0_again = [s["text"] for s in splits["train"](0)]
    epoch1 = [s["text"] for s in splits["train"](1)]
    assert epoch0 == epoch0_again  # deterministic within an epoch
    assert sorted(epoch0) == sorted(epoch1)  # same multiset of samples
    assert epoch0 != epoch1  # different order across epochs


def test_pcm16_transfer_roundtrip():
    """int16 infeed mode quantises audio losslessly for PCM16-sourced values
    and the device-side converter restores the float range."""
    import jax.numpy as jnp
    import numpy as np

    from coral_tpu.data.batching import BucketBatcher
    from coral_tpu.training.train_state import _device_audio

    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, size=16000).astype(np.int16)
    audio = pcm.astype(np.float32) / 32768.0
    samples = [{"audio_array": audio, "labels": [1, 2, 3]} for _ in range(2)]

    b16 = BucketBatcher(batch_size=2, max_seconds=1.0, num_buckets=1,
                        audio_transfer_dtype="int16")
    batch = next(iter(b16(samples)))
    assert batch["input_values"].dtype == np.int16
    restored = np.asarray(
        _device_audio(jnp.asarray(batch["input_values"]))
    )
    np.testing.assert_array_equal(
        restored[0, 0, : len(audio)] * 32768.0, pcm.astype(np.float32)
    )

    bf = BucketBatcher(batch_size=2, max_seconds=1.0, num_buckets=1,
                       audio_transfer_dtype="float32")
    assert next(iter(bf(samples)))["input_values"].dtype == np.float32


def test_synthetic_id_duration_grammar():
    """``synthetic://N@MIN-MAX`` pins the clip-duration range (the e2e
    throughput bench matches the step bench's 10 s clips this way)."""
    from coral_tpu.data.loading import _parse_synthetic_id, make_raw_source

    assert _parse_synthetic_id("synthetic://8") == (8, False, 1.5, 5.0)
    assert _parse_synthetic_id("synthetic://8@9-9.9") == (8, False, 9.0, 9.9)
    assert _parse_synthetic_id("synthetic://8@4") == (8, False, 4.0, 4.0)
    assert _parse_synthetic_id("synthetic://spelled:5") == (5, True, 1.5, 5.0)

    src = make_raw_source("synthetic://4@2-2.5", None, "train")
    secs = [len(ex["audio"]["array"]) / ex["audio"]["sampling_rate"]
            for ex in src()]
    assert len(secs) == 4 and all(2.0 <= s <= 2.5 for s in secs), secs
