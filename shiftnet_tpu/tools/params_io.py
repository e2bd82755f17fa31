"""Parameter loading: our .npz exports or reference .pth checkpoints."""
import jax
import jax.numpy as jnp

from shiftnet_tpu.models import CONFIGS, build_model
from shiftnet_tpu.tools.convert_torch import (load_reference_checkpoint,
                                              torch_state_to_flax)


def params_template(variant: str, halo: int = 2):
    cfg = CONFIGS[variant]
    model = build_model(variant, past_frames=halo, future_frames=halo)
    t = 2 * halo + 1 if halo else 3
    x = jnp.zeros((t, 32, 32, 3))
    nm = jnp.zeros((t, 32, 32, 1)) if cfg.noise_map else None
    with jax.default_device(jax.devices()[0]):
        return jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, nm))['params']


def load_params(variant: str, path: str, halo: int = 2):
    tpl = params_template(variant, halo)
    if path.endswith('.pth'):
        state = load_reference_checkpoint(path)
        return torch_state_to_flax(state, tpl)
    from shiftnet_tpu.train.checkpoint import load_params_npz
    return load_params_npz(path, tpl)
