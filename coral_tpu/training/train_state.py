"""Train state and the sharded CTC train step.

Replaces the reference's HF ``Trainer`` + DeepSpeed hot loop (reference:
``src/coral/finetune.py:60-79``, ``makefile:80-93``) with a single jitted function
over a device mesh:

- the global batch is sharded over the "data" mesh axis; XLA inserts the gradient
  allreduce (psum over ICI) during the backward pass;
- gradient accumulation runs as a ``lax.scan`` over leading-microbatch-axis inside
  the step, so one dispatch covers the full optimiser step;
- optimizer state may be ZeRO-sharded over the data axis via ``zero_shardings``;
- loss scale matches the reference: CTC "sum" per microbatch, averaged over
  devices and accumulation steps (the DDP-mean x grad-accum-divide semantics of
  the HF Trainer).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct



def _device_audio(audio):
    """Accept PCM16 infeed (half the host->device bytes) or float32."""
    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) / 32768.0
    return audio


class TrainState(struct.PyTreeNode):
    """Carried training state (a pytree; jit-donatable)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )


def make_ctc_train_step(
    model,
    tx: optax.GradientTransformation,
    schedule,
    blank_id: int,
    ctc_loss_reduction: str = "sum",
    freeze_feature_encoder: bool = False,
    augment: bool = False,
    noise_bank=None,
    grad_dtype: str | None = None,
) -> Callable:
    """Build the train step for a CTC model.

    The returned function has signature
    ``(state, batch, rng) -> (state, metrics)`` where ``batch`` contains
    ``input_values (A, B, T)``, ``input_lengths (A, B)``, ``labels (A, B, L)``,
    ``label_lengths (A, B)`` with A = gradient-accumulation microbatches. Shard the
    B axis over the data mesh axis.
    """
    from ..audio.augment import augment_batch
    from ..audio.features import znorm
    from ..ops import ctc_loss

    def microbatch_loss(params, mb, dropout_rng, spec_rng, aug_rng):
        audio = _device_audio(mb["input_values"])
        if augment:
            # The reference's CPU-worker augmentation chain (gain, background/
            # colored noise, filters; src/coral/data.py:710-738) runs fused
            # on-device here.
            audio = augment_batch(
                aug_rng, audio, mb["input_lengths"], noise_bank=noise_bank
            )
        # On-device z-norm = HF Wav2Vec2FeatureExtractor(do_normalize=True),
        # which the reference runs on CPU workers (reference:
        # src/coral/data.py:747-751).
        logits, frame_lengths = model.apply(
            {"params": params},
            znorm(audio, mb["input_lengths"]),
            mb["input_lengths"],
            deterministic=False,
            freeze_feature_encoder=freeze_feature_encoder,
            rngs={"dropout": dropout_rng, "spec_augment": spec_rng},
        )
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # (B, T, V) -> (T, B, V) for the CTC recursion
        loss = ctc_loss(
            jnp.transpose(log_probs, (1, 0, 2)),
            mb["labels"],
            frame_lengths,
            mb["label_lengths"],
            blank_id=blank_id,
            reduction=ctc_loss_reduction,
            zero_infinity=True,
        )
        if ctc_loss_reduction == "sum":
            # HF Trainer semantics: DDP mean over devices == global sum / n_dev;
            # written globally that is sum over the global batch / batch size *
            # per-device batch. We keep the per-sample scale stable by dividing by
            # the microbatch size (equivalent dynamics, size-independent logs).
            loss = loss / mb["labels"].shape[0]
        return loss

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        num_micro = batch["input_values"].shape[0]
        # Tuple-shaped split stays PRNG-implementation-agnostic (rbg keys are
        # (4,) uint32, threefry (2,)).
        rngs = jax.random.split(rng, (num_micro, 3))

        # grad_dtype="bfloat16": differentiate w.r.t. a bf16 copy of the
        # params, so every gradient buffer — including the scan-stacked
        # (L, ...) dW writes, the hottest DUS traffic in the step — is bf16;
        # the f32 master params live in `state.params` and the optimizer
        # update runs in f32 (DeepSpeed bf16 grad-reduction semantics, which
        # the reference uses through ZeRO-2; compute already casts params to
        # bf16, so the forward is unchanged).
        if grad_dtype is not None:
            work_params = jax.tree.map(
                lambda p: p.astype(grad_dtype)
                if p.dtype == jnp.float32 else p,
                state.params,
            )
        else:
            work_params = state.params

        grad_fn = jax.value_and_grad(microbatch_loss)

        if num_micro == 1:
            # No accumulation: skip the scan and the zero-init + add over the
            # full gradient tree (~58 ms/step for 300M params on v5e).
            mb = jax.tree.map(lambda x: x[0], batch)
            loss, grads = grad_fn(
                work_params, mb, rngs[0, 0], rngs[0, 1], rngs[0, 2]
            )
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        else:
            def accum_step(carry, inputs):
                loss_sum, grad_sum = carry
                mb, step_rngs = inputs
                mb_loss, mb_grads = grad_fn(
                    work_params, mb, step_rngs[0], step_rngs[1], step_rngs[2]
                )
                # Accumulate across microbatches in f32 regardless of the
                # per-microbatch gradient dtype.
                return (
                    loss_sum + mb_loss,
                    jax.tree.map(
                        lambda s, g: s + g.astype(jnp.float32),
                        grad_sum, mb_grads,
                    ),
                ), None

            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (loss_sum, grad_sum), _ = jax.lax.scan(
                accum_step, (jnp.zeros(()), zero_grads), (batch, rngs)
            )
            loss = loss_sum / num_micro
            grads = jax.tree.map(lambda g: g / num_micro, grad_sum)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "learning_rate": schedule(state.step),
        }
        return new_state, metrics

    return train_step


def make_ctc_eval_step(model) -> Callable:
    """Build the eval forward: returns greedy argmax ids and frame lengths."""
    from ..audio.features import znorm

    def eval_step(params, batch):
        logits, frame_lengths = model.apply(
            {"params": params},
            znorm(_device_audio(batch["input_values"]), batch["input_lengths"]),
            batch["input_lengths"],
            deterministic=True,
        )
        pred_ids = jnp.argmax(logits, axis=-1)  # (B, T')
        return pred_ids, frame_lengths

    return eval_step


def make_seq2seq_train_step(
    model_config,
    tx: optax.GradientTransformation,
    schedule,
    sot_id: int,
    pad_id: int,
    chunk_length: int,
    gradient_checkpointing: bool = False,
    augment: bool = False,
    noise_bank=None,
    grad_dtype: str | None = None,
) -> Callable:
    """Build the Whisper train step: on-device log-mel -> encoder-decoder -> CE.

    The reference trains through HF ``Seq2SeqTrainer`` with CPU-side feature
    extraction (reference: ``src/coral/whisper.py:124-126``,
    ``src/coral/data.py:747-751``); here the mel frontend, SpecAugment,
    teacher-forced forward and the accumulation scan all run inside one jitted
    step. Batch layout matches the CTC step: ``input_values (A, B, T)`` raw
    waveforms, ``labels (A, B, L)`` with -100 padding; ``T`` must equal
    ``chunk_length`` (30 s for checkpoint parity).
    """
    from ..audio.augment import augment_batch, peak_normalize
    from ..audio.mel import log_mel_spectrogram
    from ..models import whisper as W

    def microbatch_loss(params, mb, rng):
        audio = _device_audio(mb["input_values"])
        # 160 = mel hop, x2 for the encoder's stride-2 conv. 30 s (480000) for
        # checkpoint parity; any multiple of 320 compiles (short-window runs).
        assert audio.shape[-1] % 320 == 0, (
            f"whisper audio length must be a multiple of 320, "
            f"got {audio.shape[-1]} (expected e.g. {chunk_length})"
        )
        # Waveform peak normalisation (reference: normalise_audio=True in
        # src/coral/data.py:710-715); scale matters for the log-mel floor.
        # The augmentation chain peak-normalises before applying gain, so the
        # two branches stay mutually exclusive.
        if augment:
            rng, aug_rng = jax.random.split(rng)
            audio = augment_batch(
                aug_rng, audio, mb["input_lengths"], noise_bank=noise_bank
            )
        else:
            audio = peak_normalize(audio)
        feats = log_mel_spectrogram(
            audio, n_mels=model_config.num_mel_bins, dtype=model_config.dtype
        )
        labels = mb["labels"]
        # Shift right: decoder input t sees label t-1; -100 padding -> pad id.
        safe_labels = jnp.where(labels == -100, pad_id, labels)
        decoder_input_ids = jnp.concatenate(
            [jnp.full((labels.shape[0], 1), sot_id, labels.dtype),
             safe_labels[:, :-1]],
            axis=1,
        )
        logits = W.forward(
            params, model_config, feats, decoder_input_ids,
            deterministic=False, rng=rng,
            gradient_checkpointing=gradient_checkpointing,
        )
        mask = labels != -100
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        token_ll = jnp.take_along_axis(
            logp, safe_labels[..., None], axis=-1
        )[..., 0]
        # Mean over valid tokens (HF CrossEntropyLoss(ignore_index=-100)).
        return -jnp.sum(token_ll * mask) / jnp.maximum(jnp.sum(mask), 1)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        num_micro = batch["input_values"].shape[0]
        rngs = jax.random.split(rng, num_micro)
        grad_fn = jax.value_and_grad(microbatch_loss)

        # See make_ctc_train_step: bf16 gradient buffers, f32 master params.
        if grad_dtype is not None:
            work_params = jax.tree.map(
                lambda p: p.astype(grad_dtype)
                if p.dtype == jnp.float32 else p,
                state.params,
            )
        else:
            work_params = state.params

        if num_micro == 1:
            # No accumulation: skip the scan and the full-tree zero-init + add.
            mb = jax.tree.map(lambda x: x[0], batch)
            loss, grads = grad_fn(work_params, mb, rngs[0])
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        else:
            def accum_step(carry, inputs):
                loss_sum, grad_sum = carry
                mb, step_rng = inputs
                mb_loss, mb_grads = grad_fn(work_params, mb, step_rng)
                return (
                    loss_sum + mb_loss,
                    jax.tree.map(
                        lambda s, g: s + g.astype(jnp.float32),
                        grad_sum, mb_grads,
                    ),
                ), None

            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (loss_sum, grad_sum), _ = jax.lax.scan(
                accum_step, (jnp.zeros(()), zero_grads), (batch, rngs)
            )
            loss = loss_sum / num_micro
            grads = jax.tree.map(lambda g: g / num_micro, grad_sum)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "learning_rate": schedule(state.step),
        }
        return new_state, metrics

    return train_step


def make_whisper_generate_step(
    model_config,
    forced_ids,
    max_length: int,
    eos_id: int,
    num_beams: int = 1,
    length_penalty: float = 1.0,
    timestamps: bool = False,
    timestamp_begin: int | None = None,
) -> Callable:
    """Build the eval forward: generation from raw waveforms.

    ``num_beams=1`` runs the greedy KV-cache loop; ``num_beams>1`` the jitted
    beam search (reference surface: HF ``predict_with_generate`` /
    ``generation_max_length``, src/coral/whisper.py:214-230). ``timestamps``
    enables the Whisper timestamp grammar (pass the matching prompt without
    ``<|notimestamps|>``).
    """
    import numpy as np

    from ..audio.augment import peak_normalize
    from ..audio.mel import log_mel_spectrogram
    from ..models import whisper as W

    forced = jnp.asarray(np.asarray(forced_ids), dtype=jnp.int32)

    def generate_step(params, batch):
        feats = log_mel_spectrogram(
            peak_normalize(_device_audio(batch["input_values"])),
            n_mels=model_config.num_mel_bins,
            dtype=model_config.dtype,
        )
        if num_beams > 1:
            return W.beam_generate(
                params, model_config, feats, forced, max_length=max_length,
                eos_id=eos_id, num_beams=num_beams,
                length_penalty=length_penalty, timestamps=timestamps,
                timestamp_begin=timestamp_begin,
            )
        return W.greedy_generate(
            params, model_config, feats, forced, max_length=max_length,
            eos_id=eos_id, timestamps=timestamps,
            timestamp_begin=timestamp_begin,
        )

    return generate_step
