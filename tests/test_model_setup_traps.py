"""Silent-config-no-op traps fail loudly (VERDICT r4 item 7 / r3 advisor).

Each trap covers a config combination whose naive behaviour would be a silent
degradation: a remat policy that names a checkpoint the selected compute path
never emits, or an LN-fold flag the post-LN architecture would ignore. The
setup layer must either raise or warn — never quietly measure the wrong path
(reference bar: HF raises on incompatible ``Wav2Vec2Config`` combinations,
e.g. ``do_stable_layer_norm`` vs ``feat_extract_norm``,
``src/coral/wav2vec2.py:104-126``).
"""

import logging

import pytest

from coral_tpu.config import compose
from coral_tpu.training.model_setup import Wav2Vec2Setup

BASE = [
    "model=test-wav2vec2",
    "datasets=[synthetic]",
    "+model.architecture=tiny",
]


def make_setup(config_path, tmp_path, extra=()):
    config = compose(
        "asr_finetuning",
        overrides=BASE + [f"model_dir={tmp_path / 'model'}", *extra],
        config_path=config_path,
    )
    return Wav2Vec2Setup(config)


def test_post_ln_rejects_ffn_ln_fold(config_path, tmp_path):
    # Post-LN never routes the LN into the fused kernels; the flag would
    # silently measure the unfused path.
    with pytest.raises(ValueError, match="do_stable_layer_norm"):
        make_setup(
            config_path, tmp_path,
            extra=["+model.do_stable_layer_norm=false"],
        )


def test_post_ln_without_folds_is_accepted(config_path, tmp_path):
    setup = make_setup(
        config_path, tmp_path,
        extra=[
            "+model.do_stable_layer_norm=false",
            "+model.fused_ffn=false",
            "+model.fused_ffn_ln=false",
            "+model.fused_ffn_block=false",
            "+model.fused_ffn_block_dg=false",
        ],
    )
    assert setup.model_config.do_stable_layer_norm is False
    assert setup.model_config.fused_ffn_ln is False


def test_save_ctx_act_without_fused_ffn_warns(config_path, tmp_path, caplog):
    # save_ctx_act saves "ffn_act", which only the fused-FFN (non-block)
    # path emits; without it the policy degrades to save_attn_ctx.
    with caplog.at_level(logging.WARNING, logger="coral_tpu.training"):
        make_setup(
            config_path, tmp_path,
            extra=[
                "+model.remat_policy=save_ctx_act",
                "+model.fused_ffn=false",
                "+model.fused_ffn_ln=false",
                "+model.fused_ffn_block=false",
                "+model.fused_ffn_block_dg=false",
            ],
        )
    assert any("save_ctx_act" in r.message and "degrades" in r.message
               for r in caplog.records)


def test_save_ctx_act_with_ffn_block_warns(config_path, tmp_path, caplog):
    # The block VJP emits no "ffn_act" checkpoint at all (nothing from its
    # forward is a residual), so the policy degrades the same way.
    with caplog.at_level(logging.WARNING, logger="coral_tpu.training"):
        make_setup(
            config_path, tmp_path,
            extra=["+model.remat_policy=save_ctx_act"],
        )
    assert any("fused_ffn_block" in r.message and "degrades" in r.message
               for r in caplog.records)


def test_save_attn_ctx_with_stats_warns(config_path, tmp_path, caplog):
    # The stats attention variants add a live lse residual that
    # save_attn_ctx does not save — the replay pulls the attention forward
    # back in, defeating both knobs.
    with caplog.at_level(logging.WARNING, logger="coral_tpu.training"):
        make_setup(
            config_path, tmp_path,
            extra=["+model.remat_policy=save_attn_ctx"],
        )
    assert any("save_attn_ctx_lse" in r.message for r in caplog.records)


def test_default_stack_is_trap_free(config_path, tmp_path, caplog):
    # The shipped defaults must not trip their own guards.
    with caplog.at_level(logging.WARNING, logger="coral_tpu.training"):
        setup = make_setup(config_path, tmp_path)
    assert not any("degrades" in r.message for r in caplog.records)
    assert setup.model_config.do_stable_layer_norm is True
