"""Test configuration: run everything on a fake 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware (the standard JAX
`--xla_force_host_platform_device_count` trick). Must run before jax imports.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags +
                               ' --xla_force_host_platform_device_count=8')

# The axon TPU plugin in this image overrides JAX_PLATFORMS at import time,
# so pin the platform through the config API as well.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
