"""Child entry point for the two-process distributed test.

Runs ``finetune()`` as one rank of a multi-process JAX job over forced-host
CPU devices and dumps the returned history as JSON. Driven by
``tests/test_multiprocess.py``; mirrors one ``accelerate launch`` worker of
the reference (reference: ``makefile:80-93``, ``src/coral/finetune.py:31``).
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-path", required=True)
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--overrides", required=True,
                        help="JSON list of extra config overrides")
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/coral_tpu/jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from coral_tpu.config import compose
    from coral_tpu.training.finetune import finetune

    config = compose(
        "asr_finetuning",
        overrides=json.loads(args.overrides) + [
            f"model_dir={args.model_dir}",
            "+distributed=true",
            f"+coordinator_address=localhost:{args.port}",
            f"+num_processes={args.num_processes}",
            f"+process_id={args.process_id}",
        ],
        config_path=args.config_path,
    )
    history = finetune(config)
    out = Path(args.model_dir) / f"history_{args.process_id}.json"
    out.write_text(json.dumps(history), encoding="utf-8")


if __name__ == "__main__":
    main()
