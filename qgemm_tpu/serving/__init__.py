from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request  # noqa: F401
