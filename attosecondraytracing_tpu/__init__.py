"""attosecondraytracing_tpu — TPU-native attosecond ray tracing framework."""

__version__ = "0.1.0"
