"""Real multi-process training: 2 JAX processes x 4 CPU devices = one 8-device mesh.

The reference's multi-GPU path (``accelerate launch`` rank plumbing,
reference: ``makefile:80-93``, ``src/coral/finetune.py:31``) ships with zero
distributed test coverage; here the actual production entry
(``distributed=true`` -> ``jax.distributed.initialize`` ->
per-process data sharding -> ``make_array_from_process_local_data``) is
exercised end to end: two OS processes fine-tune together and the resulting
loss must match the single-process 8-device run on the same global batches.

Determinism argument: with every stochastic path disabled (no dropout, no
SpecAugment, no augmentation) and a single length bucket, the two-process
global batch at step k is the same sample SET as the single-process batch
(hosts take disjoint strides of the identical seeded order), and the loss —
a mean of per-sample sums — is permutation-invariant up to f32 reduction
order.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from coral_tpu.config import compose

OVERRIDES = [
    "model=test-wav2vec2",
    "datasets=[synthetic]",
    "datasets.synthetic.id=synthetic://32",
    "+model.architecture=tiny",
    "evaluation_datasets=[{id: synthetic://8, val_name: val}]",
    "mesh=[8,1]",
    "total_batch_size=8",
    "per_device_batch_size=1",
    "max_steps=3",
    "warmup_steps=2",
    "eval_steps=3",
    "save_steps=100",
    "logging_steps=1",
    "save_total_limit=1",
    "enable_experiment_tracking=false",
    "gradient_checkpointing=false",
    "max_seconds_per_example=5.0",
    "num_length_buckets=1",
    "+max_label_length=64",
    "+eval_max_samples=8",
    "model.freeze_feature_encoder=true",
    # every stochastic path off: loss must be batch-permutation-invariant
    "model.mask_time_prob=0.0",
    "model.mask_feature_prob=0.0",
    "model.activation_dropout=0.0",
    "augment_audio=false",
    # f32 end to end for a tight cross-run comparison
    "bf16_allowed=false",
    "+grad_dtype=float32",
    "+adam_mu_dtype=float32",
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path, config_path):
    # --- single-process baseline on the in-process 8-device mesh ---
    from coral_tpu.training.finetune import finetune

    single_dir = tmp_path / "single"
    config = compose(
        "asr_finetuning",
        overrides=OVERRIDES + [f"model_dir={single_dir}"],
        config_path=config_path,
    )
    single_history = finetune(config)
    assert np.isfinite(single_history["loss"])

    # --- the same run as 2 OS processes x 4 forced-host devices ---
    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=900"
    )
    env.pop("RANK", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(Path(__file__).parent / "_distributed_child.py"),
                "--config-path", str(config_path),
                "--model-dir", str(multi_dir),
                "--process-id", str(i),
                "--num-processes", "2",
                "--port", str(port),
                "--overrides", json.dumps(OVERRIDES),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    deadline = time.monotonic() + 900
    outputs = []
    for proc in procs:
        timeout = max(1.0, deadline - time.monotonic())
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            out, _ = proc.communicate()
            pytest.fail(f"distributed child timed out; output:\n{out[-4000:]}")
        outputs.append(out)
    for i, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, (
            f"child {i} failed (rc={proc.returncode}):\n{out[-4000:]}"
        )

    multi_history = json.loads(
        (multi_dir / "history_0.json").read_text(encoding="utf-8")
    )
    # Both ranks must agree with each other bit-for-bit (same jitted program,
    # psum-reduced metrics) ...
    rank1 = json.loads(
        (multi_dir / "history_1.json").read_text(encoding="utf-8")
    )
    assert multi_history["loss"] == rank1["loss"]

    # ... and with the single-process run up to f32 reduction-order noise.
    assert np.isclose(
        multi_history["loss"], single_history["loss"], rtol=1e-4, atol=1e-5
    ), (multi_history["loss"], single_history["loss"])
    assert np.isclose(
        multi_history["val_8_cer"], single_history["val_8_cer"],
        rtol=0, atol=1e-9,
    )
