"""Gradio microphone demo for a fine-tuned ASR model.

Rebuild of the reference's demo (reference: ``src/scripts/run_asr_demo.py``):
microphone audio -> mono mixdown -> resample to 16 kHz -> transcribe ->
punctuation restoration -> text box. The HF pipeline is replaced by the
framework's jitted predictor (with long-form chunking for recordings beyond the
model window); gradio and punctfix are optional — absence degrades to a stdin
loop / raw transcript::

    python scripts/run_asr_demo.py model_id=models/roest-315m
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from coral_tpu.config import compose

logger = logging.getLogger("coral_demo")

TITLE = "Dansk Talegenkendelse"
DESCRIPTION = """Optag dansk tale med mikrofonen, og få den transskriberet."""


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    config = compose(
        "demo",
        overrides=sys.argv[1:],
        config_path=Path(__file__).parent.parent / "config",
    )

    from coral_tpu.audio.resample import resample
    from coral_tpu.evaluation.evaluate import load_saved_predictor

    predictor, geometry = load_saved_predictor(config)
    sample_rate = geometry["sample_rate"]
    max_seconds = geometry["max_seconds"]

    try:
        from punctfix import PunctFixer  # optional punctuation restoration

        fixer = PunctFixer(language="da")
    except ImportError:
        logger.info("punctfix is not installed; returning raw transcripts.")
        fixer = None

    def transcribe(recording) -> str:
        in_rate, audio = recording
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 2:  # mono mixdown (reference: run_asr_demo.py:70-71)
            audio = audio.mean(axis=1)
        if np.abs(audio).max() > 1.5:  # int PCM from the browser
            audio = audio / 32768.0
        if in_rate != sample_rate:
            audio = resample(audio, in_rate, sample_rate)

        T = int(max_seconds * sample_rate)
        if len(audio) <= T:
            padded = np.zeros((1, T), dtype=np.float32)
            padded[0, : len(audio)] = audio
            texts = predictor(
                {
                    "input_values": padded,
                    "input_lengths": np.asarray([max(1, len(audio))],
                                                dtype=np.int32),
                }
            )
            text = texts[0]
        else:
            # Recording exceeds the model window: chunk with overlap and merge
            # (the HF pipeline's long-form role; coral_tpu.evaluation.longform).
            from coral_tpu.evaluation.longform import chunk_waveform

            stride = T // 6
            pieces = []
            for _, window in chunk_waveform(audio, T, stride):
                padded = np.zeros((1, T), dtype=np.float32)
                padded[0, : len(window)] = window
                pieces.append(
                    predictor(
                        {
                            "input_values": padded,
                            "input_lengths": np.asarray(
                                [max(1, len(window))], dtype=np.int32
                            ),
                        }
                    )[0]
                )
            text = " ".join(pieces)
        if fixer is not None:
            text = fixer.punctuate(text)
        return text

    try:
        import gradio as gr
    except ImportError:
        logger.warning(
            "gradio is not installed; reading WAV paths from stdin instead."
        )
        import wave

        for line in sys.stdin:
            path = line.strip()
            if not path:
                continue
            with wave.open(path, "rb") as w:
                audio = np.frombuffer(
                    w.readframes(w.getnframes()), dtype=np.int16
                ).astype(np.float32) / 32768.0
                audio = audio.reshape(-1, w.getnchannels()).mean(axis=1)
                print(transcribe((w.getframerate(), audio)))
        return

    demo = gr.Interface(
        fn=transcribe,
        inputs=gr.Audio(sources=["microphone", "upload"], type="numpy"),
        outputs=gr.Textbox(label="Transskription"),
        title=TITLE,
        description=DESCRIPTION,
        allow_flagging="never",
    )
    demo.launch(share=bool(config.get("share", False)))


if __name__ == "__main__":
    main()
