from pgmvae_tpu.utils.logging import MetricLogger, append_result  # noqa: F401
