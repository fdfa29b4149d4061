"""coral-tpu: a TPU-native Danish ASR fine-tuning and evaluation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the CoRal ASR stack
(reference: alexandrainst/coral). Models are functional flax modules trained by a
single jitted, mesh-sharded train step; the audio frontend and CTC loss run on-device;
decoding, n-gram language modelling and the data pipeline are implemented natively.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: the pipeline pulls in jax; keep bare `import coral_tpu` light.
    if name == "ASRPipeline":
        from .pipeline import ASRPipeline

        return ASRPipeline
    raise AttributeError(name)
