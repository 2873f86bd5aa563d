from entity_resolution_spark.synth.generator import SynthConfig, generate_corpus

__all__ = ["SynthConfig", "generate_corpus"]
