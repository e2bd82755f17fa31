"""Whole-network fused-CHW path equivalence vs the unfused XLA path.

``fused_chw=True`` is the Evaluator/bench default (the scored inference
configuration): the entire forward runs on packed ChwTensors through the
Pallas kernels (``ops/chw.py``/``ops/naf_chw.py``), with NHWC<->packed
conversion only at entry/exit plus the Encoder2 level-3 island.  These tests
lock two invariants for every variant:

  * the fused and unfused paths declare IDENTICAL parameter trees (the fused
    branches declare params via dummy XLA-module traces — a drifted name or
    shape would silently fork the checkpoint format), asserted on the FULL
    production configs via ``jax.eval_shape`` (no compute);
  * the fused forward numerically matches the unfused forward (CPU interpret
    mode, reduced-depth configs that keep every wiring flag: down01 phase
    conv, level-3 NHWC island, rconcat tslice/concat, final fuse, conv_last,
    ShiftCABs, shift blocks — ``models/gshift.py:301`` ``_forward_chw``).

The reference's analogous QA is its eval scripts
(``/root/reference/inference/test_deblur.py:91-177``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shiftnet_tpu.models import CONFIGS, build_model

CPU = jax.devices('cpu')[0]


@pytest.fixture(autouse=True)
def _on_cpu():
    prev = jax.config.jax_default_device
    jax.config.update('jax_default_device', CPU)
    yield
    jax.config.update('jax_default_device', prev)


def _scaled_random(params, seed):
    """Random params at torch-init-like scale (0.3/sqrt(fan_in) for conv
    kernels) so the cascade stays bounded but nothing is the identity —
    zero-init betas would reduce CAB1/CAB2 to pure shortcuts and mask any
    error in the gate/rep kernels."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(flat))
    leaves = []
    for k, (path, leaf) in zip(keys, flat):
        name = path[-1].key
        if leaf.ndim == 4:     # conv kernel (kh, kw, cin_g, cout)
            fan_in = leaf.shape[0] * leaf.shape[1] * leaf.shape[2]
            v = 0.3 / np.sqrt(fan_in) * jax.random.normal(k, leaf.shape)
        elif name == 'beta':
            v = 0.1 * jax.random.normal(k, leaf.shape)
        elif name == 'weight' and leaf.ndim <= 1:
            v = 1.0 + 0.1 * jax.random.normal(k, leaf.shape)
        else:
            # biases at full scale: a bias leaking into the layout's slack
            # columns (zero-pad invariant) must exceed the tolerance
            v = 0.1 * jax.random.normal(k, leaf.shape)
        leaves.append(v.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _inputs(cfg, t=3, h=16, w=64):
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, 3), jnp.float32)
    nm = None
    if cfg.in_channels == 4:
        nm = 0.1 * jnp.ones((t, h, w, 1), jnp.float32)
    return x, nm


# Reduced repetition counts (wiring per orb/round is identical; all
# structural flags — encoder2 levels, shift-cab placement, fuse mode,
# biases, activations — keep their production values).
SMALL_KW = dict(num_orbs=1, shift_rounds=2)


@pytest.mark.parametrize('name', list(CONFIGS))
def test_fused_unfused_equivalence(name):
    cfg = CONFIGS[name].replace(**SMALL_KW)
    x, nm = _inputs(cfg)
    fused = build_model(name, fused_chw=True, **SMALL_KW)
    unfused = build_model(name, **SMALL_KW)

    init = jax.jit(lambda r: fused.init(r, x, nm) if nm is not None
                   else fused.init(r, x))
    params = _scaled_random(init(jax.random.PRNGKey(1))['params'], 7)

    def run(model):
        fwd = jax.jit(lambda p: model.apply({'params': p}, x, nm)
                      if nm is not None
                      else model.apply({'params': p}, x))
        return np.asarray(fwd(params), np.float32)

    got, want = run(fused), run(unfused)
    assert got.shape == want.shape
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 1e-4, f'{name}: fused vs unfused normalized err {err:.3e}'


@pytest.mark.parametrize('name', list(CONFIGS))
def test_fused_param_tree_identical(name):
    """Full production configs: fused and unfused models must declare the
    exact same parameter tree (names, shapes, dtypes) — the converter and
    every checkpoint depend on it."""
    cfg = CONFIGS[name]
    x, nm = _inputs(cfg, t=3, h=16, w=64)

    def shapes(model):
        tree = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, nm)
            if nm is not None else model.init(jax.random.PRNGKey(0), x))
        return jax.tree.map(lambda l: (l.shape, l.dtype), tree)

    a = shapes(build_model(name, fused_chw=True))
    b = shapes(build_model(name))
    assert a == b


def test_stage2_chunking_exact():
    """The stage2 frame-chunk scan (``stage2_chunk``, models/gshift.py
    ``_forward_chw``) must be EXACT vs the unchunked fused path — stage2
    is per-frame, so chunking only regroups ops."""
    kw = dict(**SMALL_KW, past_frames=2, future_frames=2)
    x, _ = _inputs(CONFIGS['deblur_plus'], t=8)
    whole = build_model('deblur_plus', fused_chw=True, stage2_chunk=0, **kw)
    chunked = build_model('deblur_plus', fused_chw=True, stage2_chunk=2,
                          **kw)
    params = _scaled_random(
        jax.jit(whole.init)(jax.random.PRNGKey(1), x)['params'], 7)

    a = np.asarray(jax.jit(lambda p: whole.apply({'params': p}, x))(params))
    b = np.asarray(jax.jit(lambda p: chunked.apply({'params': p}, x))(params))
    assert a.shape == b.shape == (4, 16, 64, 3)
    assert np.array_equal(a, b), np.max(np.abs(a - b))


def test_stage2_chunking_grads_match():
    """Gradients through the chunked stage2 (scan + dynamic_slice) must
    match the unchunked fused path — single-chip training runs this."""
    kw = dict(**SMALL_KW, past_frames=1, future_frames=1)
    x, _ = _inputs(CONFIGS['deblur_plus'], t=6)
    whole = build_model('deblur_plus', fused_chw=True, stage2_chunk=0, **kw)
    chunked = build_model('deblur_plus', fused_chw=True, stage2_chunk=2,
                          **kw)
    params = _scaled_random(
        jax.jit(whole.init)(jax.random.PRNGKey(2), x)['params'], 9)

    def loss(model):
        return jax.jit(jax.grad(
            lambda p: jnp.mean(jnp.abs(model.apply({'params': p}, x)))))

    ga = loss(whole)(params)
    gb = loss(chunked)(params)
    scale = max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(ga))
    err = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)))
    assert err / (scale + 1e-9) < 1e-5, (err, scale)
