"""Model-setup factory: config -> tokenizer + params + jitted step builders.

Mirrors the reference's setup layer (reference: ``src/coral/model_setup.py:10-31``
dispatching on ``config.model.type``, and the per-family setup classes in
``src/coral/wav2vec2.py`` / ``src/coral/whisper.py``), rebuilt around functional
models and jitted step functions instead of HF Trainer plumbing. Each family
exposes the same small surface to the trainer loop:

- ``init_params(rng)`` — pretrained weights when found locally, else random init;
- ``make_train_step(tx, schedule)`` — the full accumulation-scan train step;
- ``make_predictor(mesh, param_sharding)`` — jitted batch -> transcript strings,
  used by training-time validation and by the evaluation pipeline.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import Wav2Vec2Config, Wav2Vec2ForCTC
from ..models.whisper import WhisperConfig
from ..parallel import batch_sharding, host_batch_to_global, replicated
from ..text.tokenizer import CtcTokenizer, dump_vocabulary
from ..text.whisper_tokenizer import WhisperTokenizer

logger = logging.getLogger(__package__)

_W2V2_ARCHS: dict[str, Callable[..., Wav2Vec2Config]] = {
    "tiny": Wav2Vec2Config.tiny,
    "300m": Wav2Vec2Config.xls_r_300m,
    "1b": Wav2Vec2Config.xls_r_1b,
    "2b": Wav2Vec2Config.xls_r_2b,
}

# Ordered: first matching substring of `pretrained_model_id` wins.
_WHISPER_ARCHS: list[tuple[str, Callable[..., WhisperConfig]]] = [
    ("tiny_test", WhisperConfig.tiny_test),
    ("turbo", WhisperConfig.large_v3_turbo),
    ("large-v3", WhisperConfig.large_v3),
    ("large", WhisperConfig.large_v2),
    ("medium", WhisperConfig.medium),
    ("small", WhisperConfig.small),
    ("base", WhisperConfig.base),
    ("tiny", WhisperConfig.tiny),
]


def _find_local_checkpoint(pretrained_model_id: str | None) -> Path | None:
    """Resolve a local safetensors/pytorch checkpoint for a pretrained id.

    Checks the id as a filesystem path and the HF cache layout; returns None when
    nothing is on disk (zero-egress environments train from random init).
    """
    if not pretrained_model_id:
        return None
    candidates = [Path(pretrained_model_id)]
    hf_home = Path(os.environ.get("HF_HOME", Path.home() / ".cache/huggingface"))
    repo_dir = hf_home / "hub" / f"models--{pretrained_model_id.replace('/', '--')}"
    if repo_dir.exists():
        candidates.extend(sorted((repo_dir / "snapshots").glob("*")))
    for cand in candidates:
        if cand.is_file():
            return cand
        if cand.is_dir():
            for name in ("model.safetensors", "pytorch_model.bin"):
                if (cand / name).exists():
                    return cand / name
    return None


def _augmentation_settings(config: Any, is_main: bool) -> tuple[bool, Any]:
    """Resolve train-time augmentation (reference trains with the augmentation
    chain on; ``src/coral/data.py:246-258``) and the optional noise bank."""
    augment = bool(config.get("augment_audio", True))
    noise_bank = None
    noise_path = config.get("background_noise_path")
    if augment and noise_path is None and config.get("download_noise", False):
        from ..audio.noise_bank import download_background_noises

        noise_path = download_background_noises(
            Path(config.get("cache_dir") or Path.home() / ".cache/coral_tpu")
        )
    if augment and noise_path:
        from ..audio.noise_bank import load_noise_bank

        noise_bank = load_noise_bank(
            noise_path, sample_rate=int(config.model.sampling_rate)
        )
        if noise_bank is not None and is_main:
            logger.info(f"Background-noise bank: {noise_bank.shape}")
    return augment, noise_bank


def _multi_device_layerdrop(layerdrop: float, is_main: bool) -> float:
    """Zero layerdrop on a multi-device mesh, as the reference forces for
    multi-GPU (reference: ``src/scripts/finetune_asr_model.py:47-54``).
    Stochastic layer skipping would desynchronise a single traced program."""
    if len(jax.devices()) > 1 and layerdrop != 0.0:
        if is_main:
            logger.info("Disabling layerdrop for the multi-device mesh.")
        return 0.0
    return layerdrop


class Wav2Vec2Setup:
    """wav2vec2-CTC family (reference: ``src/coral/wav2vec2.py:35-306``)."""

    model_type = "wav2vec2"

    def __init__(self, config: Any, is_main: bool = True) -> None:
        self.config = config
        model_cfg = config.model
        model_dir = Path(config.model_dir)
        if is_main:
            dump_vocabulary(model_cfg.characters_to_keep, model_dir)
        self.tokenizer = CtcTokenizer.from_characters(model_cfg.characters_to_keep)

        use_bf16 = bool(config.get("bf16_allowed", True))
        arch = self._infer_arch(model_cfg)
        attention_impl = model_cfg.get("attention_impl", "pallas")
        # False | true (v1) | "v2" | "v3" — see models/wav2vec2.py. Default
        # v3 (round-5 hardware A/B: neutral vs v2 on its own, 960.5 vs
        # 963.8, but it unlocks the in-kernel q/k/v biases below).
        attention_save_stats = model_cfg.get("attention_save_stats", "v3")
        self.model_config = arch(
            vocab_size=self.tokenizer.vocab_size,
            dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
            hidden_dropout=model_cfg.get("hidden_dropout", 0.0),
            activation_dropout=model_cfg.get("activation_dropout", 0.1),
            attention_dropout=model_cfg.get("attention_dropout", 0.0),
            feat_proj_dropout=model_cfg.get("feat_proj_dropout", 0.0),
            final_dropout=model_cfg.get("final_dropout", 0.0),
            layerdrop=_multi_device_layerdrop(
                model_cfg.get("layerdrop", 0.0), is_main
            ),
            mask_time_prob=model_cfg.get("mask_time_prob", 0.5),
            mask_time_length=model_cfg.get("mask_time_length", 10),
            mask_feature_prob=model_cfg.get("mask_feature_prob", 0.5),
            mask_feature_length=model_cfg.get("mask_feature_length", 64),
            attention_impl=attention_impl,
            attention_save_stats=attention_save_stats,
            attention_o_residual=bool(
                model_cfg.get("attention_o_residual", False)
            ),
            fused_fe_conv=bool(model_cfg.get("fused_fe_conv", True)),
            encoder_ln_impl=model_cfg.get("encoder_ln_impl", "pallas"),
            # Defaults = the measured round-3 winning stack (bench.py /
            # PARITY.md attribution table: fused FFN w/ LN fold + folded
            # positional conv, 871.5 audio-s/s/chip at B=48 on v5e), so the
            # production `model=wav2vec2-small` surface delivers the headline
            # number. Each flag keeps its per-flag opt-out.
            fused_ffn=bool(model_cfg.get("fused_ffn", True))
            or bool(model_cfg.get("fused_ffn_ln", False)),
            fused_ffn_ln=bool(
                model_cfg.get("fused_ffn_ln", model_cfg.get("fused_ffn", True))
            ),
            fused_qkv_ln=bool(model_cfg.get("fused_qkv_ln", False)),
            # q/k/v projection biases applied inside the attention kernel
            # (requires attention_impl=pallas + attention_save_stats=v3;
            # the model raises on misconfiguration rather than silently
            # falling back). Default ON whenever the prerequisites hold —
            # round-5 hardware A/B at the adopted stack: 973.8 vs 962.9
            # audio-s/s/chip (the backward emits dbq/dbk/dbv as in-register
            # row sums instead of XLA re-reading three (B,T,D) cotangents).
            attention_fused_qkv_bias=bool(
                model_cfg.get(
                    "attention_fused_qkv_bias",
                    attention_impl == "pallas"
                    and attention_save_stats == "v3"
                    and not bool(model_cfg.get("fused_qkv_ln", False)),
                )
            ),
            # Whole-FFN block VJP (fc1 kernel + fc2 in one custom_vjp; the
            # remat replay DCEs the FFN forward): 892.9 vs 871.1 audio-s/s
            # at B=48 on the round-4 A/B — adopted.
            fused_ffn_block=bool(model_cfg.get("fused_ffn_block", True)),
            # In-kernel dW accumulation; measured slower, default off.
            fused_ffn_block_dw=bool(
                model_cfg.get("fused_ffn_block_dw", False)
            ),
            # fc2 folded into the block's forward kernel; measured slower,
            # default off.
            fused_ffn_block_fc2=bool(
                model_cfg.get("fused_ffn_block_fc2", False)
            ),
            # dg computed inside the backward kernel: 938.8 vs 917.5
            # audio-s/s at B=48 on the round-4 A/B (the backward was partly
            # DMA-bound on the 196 MB/layer dg read) — adopted.
            fused_ffn_block_dg=bool(
                model_cfg.get("fused_ffn_block_dg", True)
            ),
            pos_conv_fold=bool(model_cfg.get("pos_conv_fold", True)),
            # Forwarded so the post-LN guard below is reachable from the
            # config surface (otherwise model.do_stable_layer_norm=false
            # would itself be a silent no-op).
            do_stable_layer_norm=bool(
                model_cfg.get("do_stable_layer_norm", True)
            ),
        )
        if not self.model_config.do_stable_layer_norm and (
            self.model_config.fused_ffn_ln or self.model_config.fused_qkv_ln
        ):
            # The LN folds assume the pre-LN architecture (single-consumer
            # LN); the post-LN branch never routes the LN into the fused
            # kernels, so the flags would silently measure the unfused path.
            raise ValueError(
                "fused_ffn_ln / fused_qkv_ln require do_stable_layer_norm "
                "(pre-LN, the XLS-R architecture); set fused_ffn_ln=false "
                "and fused_qkv_ln=false for post-LN configs."
            )
        # Default = save_qk_ctx (round-4 A/Bs at B=48 with the FFN block:
        # nothing_saveable 892.9 -> save_attn_ctx 905.3/906.5 -> + the v2
        # stats residual (save_attn_ctx_lse) 910.7 -> + saved q/k
        # projections 918.8 — the remat replay then carries only the LN +
        # v/o projection matmuls; q, k, ctx and the ~1 MB lse come from
        # storage. ~3.6 GB of saved residuals at B=48 x 10 s; memory-
        # tighter configs opt out with save_attn_ctx_lse/nothing_saveable.
        # Accepted at both levels (model.remat_policy wins): the whisper
        # setup reads model.remat_policy, so ignoring it here would be a
        # silent no-op for users who move a config between families.
        remat_policy = model_cfg.get(
            "remat_policy", config.get("remat_policy", "save_qk_ctx")
        )
        if remat_policy == "save_ctx_act" and not self.model_config.fused_ffn:
            # save_ctx_act saves "ffn_act", emitted only on the fused-FFN
            # path (the unfused path names "ffn_hidden"); without fused_ffn
            # it silently degrades to save_attn_ctx behaviour.
            logger.warning(
                "remat_policy=save_ctx_act without fused_ffn degrades to "
                "save_attn_ctx (no 'ffn_act' checkpoint is emitted)."
            )
        if remat_policy == "save_ctx_act" and self.model_config.fused_ffn_block:
            # The block VJP never emits "ffn_act" (the whole point: nothing
            # from its forward is a residual), so the policy degrades the
            # same way.
            logger.warning(
                "remat_policy=save_ctx_act with fused_ffn_block degrades to "
                "save_attn_ctx (the FFN block emits no 'ffn_act' checkpoint)."
            )
        if remat_policy in ("save_attn_ctx", "save_ctx_act") and (
            self.model_config.attention_save_stats
        ) and self.model_config.attention_impl == "pallas":
            # The stats variants add a live lse residual that the named
            # policies do not save, which pulls the attention forward back
            # into the remat replay — defeating both the policy and the
            # stats variant's saved passes.
            logger.warning(
                f"remat_policy={remat_policy} with attention_save_stats "
                "forces an attention forward replay to rebuild the unsaved "
                "lse residual; use remat_policy=save_attn_ctx_lse (default) "
                "or nothing_saveable with the stats variants."
            )
        self.model = Wav2Vec2ForCTC(
            self.model_config,
            gradient_checkpointing=bool(config.get("gradient_checkpointing", True)),
            # Default = full replay (nothing_saveable): with the fused FFN/LN
            # and attention kernels the recompute is cheaper than the
            # saved-activation stacking traffic named-checkpoint policies pay
            # (round-3 A/Bs, PARITY.md attribution table); it also frees the
            # HBM that lets B=48 fit. See models/wav2vec2.py:_REMAT_POLICIES.
            remat_policy=remat_policy,
            # Default OFF since round 3: the fused kernels freed enough HBM
            # for the conv intermediates (767 -> 778 audio-s/s), and the
            # fused conv blocks emit no "conv_raw" checkpoint name, so the
            # FE remat policy would replay the whole fused stack anyway.
            remat_feature_encoder=bool(
                config.get("remat_feature_encoder", False)
            ),
        )
        self.blank_id = self.tokenizer.pad_token_id
        self.ctc_loss_reduction = model_cfg.get("ctc_loss_reduction", "sum")
        self.freeze_feature_encoder = bool(
            model_cfg.get("freeze_feature_encoder", False)
        )
        self.learning_rate = float(model_cfg.get("learning_rate", 1e-4))
        # Audio batch geometry: CTC trains on length-bucketed clips.
        self.audio_pad_seconds = float(config.max_seconds_per_example)
        self.force_single_bucket = False
        self.max_label_length = self.tokenizer.model_max_length
        self._ckpt = _find_local_checkpoint(model_cfg.get("pretrained_model_id"))
        if self._ckpt is None and is_main and model_cfg.get("pretrained_model_id"):
            logger.warning(
                f"Pretrained checkpoint {model_cfg.pretrained_model_id!r} not "
                "found locally; initialising from scratch."
            )
        self._is_main = is_main

    @staticmethod
    def _infer_arch(model_cfg: Any) -> Callable[..., Wav2Vec2Config]:
        explicit = model_cfg.get("architecture")
        if explicit is not None:
            if explicit not in _W2V2_ARCHS:
                raise ValueError(f"Unknown wav2vec2 architecture {explicit!r}")
            return _W2V2_ARCHS[explicit]
        pretrained = (model_cfg.get("pretrained_model_id") or "").lower()
        for key, factory in _W2V2_ARCHS.items():
            if key in pretrained:
                return factory
        return Wav2Vec2Config.xls_r_300m

    def init_params(self, rng: jax.Array) -> Any:
        sr = int(self.config.model.sampling_rate)
        params = self.model.init(
            {"params": rng}, jnp.zeros((1, sr)), jnp.asarray([sr])
        )["params"]
        if self._ckpt is not None:
            from ..models.convert import (
                load_torch_state_dict,
                wav2vec2_params_from_torch,
            )

            if self._is_main:
                logger.info(f"Loading pretrained weights from {self._ckpt}")
            params = wav2vec2_params_from_torch(
                load_torch_state_dict(self._ckpt), self.model_config
            )
        return params

    def make_train_step(self, tx, schedule) -> Callable:
        from .train_state import make_ctc_train_step

        augment, noise_bank = _augmentation_settings(self.config, self._is_main)
        return make_ctc_train_step(
            self.model, tx, schedule,
            blank_id=self.blank_id,
            ctc_loss_reduction=self.ctc_loss_reduction,
            freeze_feature_encoder=self.freeze_feature_encoder,
            augment=augment,
            noise_bank=noise_bank,
            # bf16 gradient buffers with f32 master params (DeepSpeed bf16
            # grad-reduction semantics) — measured faster at B=48 in the
            # adopted round-3 stack; `grad_dtype: float32` opts out.
            grad_dtype=self.config.get("grad_dtype", "bfloat16"),
        )

    def make_predictor(self, mesh, param_sharding) -> Callable:
        """Jitted greedy CTC decode: host batch -> list of transcript strings."""
        from .train_state import make_ctc_eval_step

        eval_sh = {
            "input_values": batch_sharding(mesh, axis=0),
            "input_lengths": batch_sharding(mesh, axis=0),
        }
        eval_step = jax.jit(
            make_ctc_eval_step(self.model),
            in_shardings=(param_sharding, eval_sh),
            # Replicated ids: every host decodes the full batch (multi-host
            # eval parity), and the arrays are tiny.
            out_shardings=(replicated(mesh), replicated(mesh)),
        )
        tokenizer = self.tokenizer

        def predict(params, batch: dict) -> list[str]:
            pred_ids, frame_lengths = eval_step(
                params, host_batch_to_global(batch, eval_sh)
            )
            pred_ids = np.asarray(pred_ids)
            frame_lengths = np.asarray(frame_lengths)
            return [
                tokenizer.decode(pred_ids[i, : frame_lengths[i]])
                for i in range(pred_ids.shape[0])
            ]

        return predict

    def make_beam_predictor(
        self,
        mesh,
        param_sharding,
        arpa_path,
        alpha: float = 0.5,
        beta: float = 1.5,
        beam_width: int = 100,
    ) -> Callable:
        """Beam-search transcriber with n-gram shallow fusion.

        The reference reaches this through ``Wav2Vec2ProcessorWithLM`` +
        pyctcdecode (reference: ``src/coral/compute_metrics.py:53-54``); here
        the device produces log-probs and the in-repo C++ decoder
        (``coral_tpu/native/ctc_beam.cc``) fuses the LM on the host.
        """
        from ..audio.features import znorm
        from ..decoding import BeamSearchDecoder, NGramModel

        model = self.model

        def logprob_step(params, batch):
            logits, frame_lengths = model.apply(
                {"params": params},
                znorm(batch["input_values"], batch["input_lengths"]),
                batch["input_lengths"],
                deterministic=True,
            )
            return jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1
            ), frame_lengths

        eval_sh = {
            "input_values": batch_sharding(mesh, axis=0),
            "input_lengths": batch_sharding(mesh, axis=0),
        }
        step = jax.jit(
            logprob_step,
            in_shardings=(param_sharding, eval_sh),
            out_shardings=(replicated(mesh), replicated(mesh)),
        )

        vocab = [
            self.tokenizer.ids_to_tokens[i]
            for i in range(self.tokenizer.vocab_size)
        ]
        decoder = BeamSearchDecoder(
            vocab,
            blank_id=self.blank_id,
            word_sep_id=vocab.index(self.tokenizer.word_delimiter_token),
            lm=NGramModel(arpa_path),
            alpha=alpha,
            beta=beta,
            beam_width=beam_width,
        )

        def predict(params, batch: dict) -> list[str]:
            log_probs, frame_lengths = step(
                params, host_batch_to_global(batch, eval_sh)
            )
            return decoder.decode_batch(
                np.asarray(log_probs), np.asarray(frame_lengths)
            )

        return predict


class WhisperSetup:
    """Whisper seq2seq family (reference: ``src/coral/whisper.py:35-267``)."""

    model_type = "whisper"
    CHUNK_SECONDS = 30  # published checkpoints expect 30 s / 3000 mel frames

    def __init__(self, config: Any, is_main: bool = True) -> None:
        self.config = config
        model_cfg = config.model
        use_bf16 = bool(config.get("bf16_allowed", True))
        arch, is_v3 = self._infer_arch(model_cfg)

        self._ckpt = _find_local_checkpoint(model_cfg.get("pretrained_model_id"))
        language = model_cfg.get("language", "danish")
        task = model_cfg.get("task", "transcribe")
        if self._ckpt is not None and (self._ckpt.parent / "vocab.json").exists():
            self.tokenizer = WhisperTokenizer.from_pretrained(
                self._ckpt.parent, language=language, task=task,
                multilingual_v3=is_v3,
            )
        else:
            if is_main and model_cfg.get("pretrained_model_id"):
                logger.warning(
                    f"Pretrained checkpoint {model_cfg.pretrained_model_id!r} "
                    "not found locally; using a byte-fallback tokenizer and "
                    "random init."
                )
            self.tokenizer = WhisperTokenizer.byte_fallback(
                language=language, task=task
            )
            self._ckpt = None

        self.model_config = arch(
            vocab_size=self.tokenizer.vocab_size,
            dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
            dropout=model_cfg.get("dropout", 0.0),
            activation_dropout=model_cfg.get("activation_dropout", 0.1),
            attention_dropout=model_cfg.get("attention_dropout", 0.0),
            mask_time_prob=model_cfg.get("mask_time_prob", 0.5),
            mask_time_length=model_cfg.get("mask_time_length", 10),
            mask_feature_prob=model_cfg.get("mask_feature_prob", 0.5),
            mask_feature_length=model_cfg.get("mask_feature_length", 64),
        )
        # Selective remat (save the matmul inputs; +7% measured on small) fits
        # up to whisper-medium on one v5e; the 1280-wide large family can't
        # hold 7+ saved (B,T,D) tensors/layer, but save_flash_ctx (only the
        # flash VJP residuals + attention contexts, ~2/layer) beats full
        # recompute there — round-5 large-v3-turbo frontier on v5e:
        # save_flash_ctx B=8 315.4 audio-s/s vs nothing_saveable B=8 297.7 /
        # B=10 298.1 (save_matmul_inputs OOMs at B=6). Override with
        # model.remat_policy.
        arch_default_policy = (
            "save_flash_ctx"
            if self.model_config.d_model >= 1280
            else "save_matmul_inputs"
        )
        self.model_config = dataclasses.replace(
            self.model_config,
            remat_policy=model_cfg.get("remat_policy", arch_default_policy),
            # Round-4 whisper-small A/Bs (tools/bench_whisper.py, v5e):
            # fused FFN w/ LN fold 1320 -> 1362 audio-s/s, + bf16 grad
            # buffers 1374 (adopted as defaults below and in make_train_step);
            # pallas train-path LNs measured 1344 (REJECTED — xla stays).
            ln_impl=model_cfg.get("ln_impl", "xla"),
            fused_ffn=bool(model_cfg.get("fused_ffn", True))
            or bool(model_cfg.get("fused_ffn_ln", False)),
            fused_ffn_ln=bool(
                model_cfg.get("fused_ffn_ln", model_cfg.get("fused_ffn", True))
            ),
            # Whole-FFN block VJP: whisper-small 1374.5 -> 1384.1 audio-s/s
            # on the round-4 A/B — adopted.
            fused_ffn_block=bool(model_cfg.get("fused_ffn_block", True)),
            fused_ffn_block_dw=bool(
                model_cfg.get("fused_ffn_block_dw", False)
            ),
            fused_ffn_block_fc2=bool(
                model_cfg.get("fused_ffn_block_fc2", False)
            ),
            # 1384.1 -> 1415.8 audio-s/s on the round-4 A/B — adopted.
            fused_ffn_block_dg=bool(
                model_cfg.get("fused_ffn_block_dg", True)
            ),
        )
        _ = _multi_device_layerdrop(model_cfg.get("layerdrop", 0.0), is_main)
        self.learning_rate = float(model_cfg.get("learning_rate", 1e-5))
        self.generation_max_length = int(model_cfg.get("max_length", 225))
        self.gradient_checkpointing = bool(
            config.get("gradient_checkpointing", True)
        )
        chunk_seconds = float(model_cfg.get("chunk_seconds", self.CHUNK_SECONDS))
        self.audio_pad_seconds = chunk_seconds
        self.force_single_bucket = True
        self.chunk_length = int(chunk_seconds * config.model.sampling_rate)
        # Label padding must stay within the decoder's position table.
        self.max_label_length = min(
            self.tokenizer.model_max_length,
            self.model_config.max_target_positions,
        )
        self._is_main = is_main

    @staticmethod
    def _infer_arch(model_cfg: Any) -> tuple[Callable[..., WhisperConfig], bool]:
        explicit = model_cfg.get("architecture")
        pretrained = (model_cfg.get("pretrained_model_id") or "").lower()
        key_source = explicit if explicit is not None else pretrained
        for key, factory in _WHISPER_ARCHS:
            if key in key_source:
                return factory, key in ("turbo", "large-v3")
        if explicit is not None:
            raise ValueError(f"Unknown whisper architecture {explicit!r}")
        return WhisperConfig.small, False

    def init_params(self, rng: jax.Array) -> Any:
        from ..models.whisper import init_whisper_params

        if self._ckpt is not None:
            from ..models.convert import (
                load_torch_state_dict,
                whisper_params_from_torch,
            )

            if self._is_main:
                logger.info(f"Loading pretrained weights from {self._ckpt}")
            return whisper_params_from_torch(
                load_torch_state_dict(self._ckpt), self.model_config
            )
        return init_whisper_params(rng, self.model_config)

    def make_train_step(self, tx, schedule) -> Callable:
        from .train_state import make_seq2seq_train_step

        augment, noise_bank = _augmentation_settings(self.config, self._is_main)
        return make_seq2seq_train_step(
            self.model_config, tx, schedule,
            sot_id=self.tokenizer.sot_token_id,
            pad_id=self.tokenizer.pad_token_id,
            chunk_length=self.chunk_length,
            gradient_checkpointing=self.gradient_checkpointing,
            augment=augment,
            noise_bank=noise_bank,
            # bf16 gradient buffers: whisper-small 1362 -> 1374 audio-s/s
            # (round-4 A/B); `grad_dtype: float32` opts out.
            grad_dtype=self.config.get("grad_dtype", "bfloat16"),
        )

    def make_predictor(self, mesh, param_sharding) -> Callable:
        """Jitted generation: host batch -> list of transcript strings.

        ``generation_num_beams`` in the model config switches to the jitted
        beam search (the reference's ``predict_with_generate`` beam surface,
        src/coral/whisper.py:214-230); 1 = greedy.
        """
        from .train_state import make_whisper_generate_step

        model_cfg = self.config.model
        num_beams = int(model_cfg.get("generation_num_beams", 1))
        timestamps = bool(model_cfg.get("return_timestamps", False))
        eval_sh = {
            "input_values": batch_sharding(mesh, axis=0),
            "input_lengths": batch_sharding(mesh, axis=0),
        }
        generate = jax.jit(
            make_whisper_generate_step(
                self.model_config,
                forced_ids=(
                    self.tokenizer.forced_decoder_ids_timestamps
                    if timestamps else self.tokenizer.forced_decoder_ids
                ),
                max_length=self.generation_max_length,
                eos_id=self.tokenizer.eos_token_id,
                num_beams=num_beams,
                length_penalty=float(
                    model_cfg.get("generation_length_penalty", 1.0)
                ),
                timestamps=timestamps,
                timestamp_begin=self.tokenizer.timestamp_begin,
            ),
            in_shardings=(param_sharding, eval_sh),
            out_shardings=replicated(mesh),
        )
        tokenizer = self.tokenizer

        def predict(params, batch: dict) -> list[str]:
            ids = np.asarray(
                generate(params, host_batch_to_global(batch, eval_sh))
            )
            return tokenizer.batch_decode(ids)

        return predict


def load_model_setup(config: Any, is_main: bool = True):
    """Dispatch on ``config.model.type`` (reference: ``model_setup.py:24-31``)."""
    model_type = config.model.type
    if model_type == "wav2vec2":
        return Wav2Vec2Setup(config, is_main=is_main)
    if model_type == "whisper":
        return WhisperSetup(config, is_main=is_main)
    raise ValueError(f"Unsupported model type: {model_type!r}")
