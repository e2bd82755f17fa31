from shiftnet_tpu.models.gshift import (
    CONFIGS, DEBLUR_PLUS, DEBLUR_SMALL, DENOISE_PLUS, DENOISE_SMALL,
    GShiftNet, GShiftNetConfig, build_model,
)


def init_params(model, x, noise_map=None, seed: int = 0):
    """Jitted parameter init (eager flax init dispatches thousands of ops
    one-by-one — pathological on TPU)."""
    import jax
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def _init(rng, x, nm):
        if nm is not None:
            return model.init(rng, x, nm)
        return model.init(rng, x)

    variables = _init(jax.random.PRNGKey(seed), x, noise_map)
    return variables['params']
