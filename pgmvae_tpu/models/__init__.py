from pgmvae_tpu.models.vqvae import (  # noqa: F401
    VqVaeConfig,
    init_model,
    apply_model,
    encode,
    encode_codes,
    gather_variables,
    ForwardOut,
)
