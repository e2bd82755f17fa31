"""Test configuration.

This environment force-registers the TPU plugin via sitecustomize, so
``JAX_PLATFORMS=cpu`` cannot be relied on; instead we
  * request 8 virtual CPU host devices (multi-chip tests use
    ``jax.devices('cpu')`` explicitly), and
  * pin fp32 matmul/conv precision to 'highest' so parity tests are exact on
    TPU MXUs too (default TPU fp32 precision is bf16-ish).
"""
import os
import pathlib
import sys

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import numpy as np
import pytest

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

FIXTURES = pathlib.Path(__file__).parent / 'fixtures'


def cpu_devices(n: int = 8):
    devs = jax.devices('cpu')
    assert len(devs) >= n, f'need {n} cpu devices, have {len(devs)}'
    return devs[:n]


@pytest.fixture(scope='session')
def fixtures_dir():
    return FIXTURES


def load_fixture(name: str):
    path = FIXTURES / f'{name}.npz'
    if not path.exists():
        pytest.skip(f'fixture {name} missing — run tests/gen_fixtures.py')
    return np.load(path)
