"""Torch<->flax key mapping and round-trip conversion."""
import numpy as np

from shiftnet_tpu.tools.convert_torch import (flax_path_to_torch_key,
                                              flax_to_torch_state,
                                              load_reference_checkpoint,
                                              torch_state_to_flax)


def test_key_mapping_rules():
    cases = [
        (('feat_extract__0', 'conv', 'kernel'), 'feat_extract.0.weight'),
        (('feat_extract__1', 'body__1', 'weight'),
         'feat_extract.1.body.1.weight'),
        (('stage1', 'decoder_level1_1', 'encoder_level1_2__0', 'body__0',
          'conv', 'kernel'),
         'stage1.decoder_level1_1.encoder_level1_2.0.body.0.weight'),
        (('orb1', 'encoder_level2__1', 'CA', 'conv_du__0', 'conv', 'kernel'),
         'orb1.encoder_level2.1.CA.conv_du.0.weight'),
        (('stage1', 'down12', 'down__0', 'conv', 'kernel'),
         'stage1.down12.down.0.weight'),
        (('stage1', 'up21', 'up__1', 'conv', 'kernel'),
         'stage1.up21.up.1.weight'),
        (('stage1', 'upsample0', 'upsample_conv', 'conv', 'bias'),
         'stage1.upsample0.upsample_conv.bias'),
        (('rorb2', 'skip_attn1', 'body__1', 'weight'),
         'rorb2.skip_attn1.body.1.weight'),
        (('stage1', 'decoder_level3', 'encoder_level1__0', 'norm', 'bias'),
         'stage1.decoder_level3.encoder_level1.0.norm.bias'),
        (('stage1', 'decoder_level3', 'encoder_level1__0', 'beta'),
         'stage1.decoder_level3.encoder_level1.0.beta'),
    ]
    for path, want in cases:
        assert flax_path_to_torch_key(path) == want, path


def test_round_trip():
    rng = np.random.default_rng(0)
    params = {
        'feat_extract__0': {'conv': {
            'kernel': rng.standard_normal((3, 3, 3, 24)).astype(np.float32),
            'bias': rng.standard_normal(24).astype(np.float32)}},
        'stage1': {'decoder_level1': {'encoder_level1__0': {
            'beta': rng.standard_normal((1, 1, 1, 80)).astype(np.float32),
            'norm': {'weight': np.ones(120, np.float32),
                     'bias': np.zeros(120, np.float32)},
        }}},
    }
    state = flax_to_torch_state(params)
    assert state['feat_extract.0.weight'].shape == (24, 3, 3, 3)
    assert state['stage1.decoder_level1.encoder_level1.0.beta'].shape == \
        (1, 80, 1, 1)
    back = torch_state_to_flax(state, params)

    def cmp(a, b):
        for k in a:
            if isinstance(a[k], dict):
                cmp(a[k], b[k])
            else:
                np.testing.assert_array_equal(a[k], b[k])
    cmp(params, back)


def test_pth_checkpoint_ingestion(tmp_path):
    """End-to-end `.pth` file ingestion: write a reference-format checkpoint
    (``{'params': state_dict}``, ``base_model.py:193-224``) with torch.save
    and load it back through ``load_reference_checkpoint`` +
    ``torch_state_to_flax`` — the exact path a user takes with the released
    GoPro/DAVIS checkpoints."""
    import torch

    rng = np.random.default_rng(3)
    params = {
        'feat_extract__0': {'conv': {
            'kernel': rng.standard_normal((3, 3, 3, 24)).astype(np.float32),
            'bias': rng.standard_normal(24).astype(np.float32)}},
        'stage1': {'decoder_level3': {'encoder_level1__0': {
            'beta': rng.standard_normal((1, 1, 1, 80)).astype(np.float32),
            'norm': {'weight': np.ones(120, np.float32),
                     'bias': np.zeros(120, np.float32)},
            'body__1': {'conv_2': {'conv': {'kernel': rng.standard_normal(
                (3, 3, 1, 160)).astype(np.float32)}}},
        }}},
    }
    state = {k: torch.from_numpy(v)
             for k, v in flax_to_torch_state(params).items()}
    path = str(tmp_path / 'net_g.pth')
    torch.save({'params': state}, path)

    loaded = load_reference_checkpoint(path)
    assert set(loaded) == set(flax_to_torch_state(params))
    back = torch_state_to_flax(loaded, params, strict=True)

    def cmp(a, b):
        for k in a:
            if isinstance(a[k], dict):
                cmp(a[k], b[k])
            else:
                np.testing.assert_array_equal(a[k], b[k])
    cmp(params, back)

    # the bare-state_dict form (no 'params' wrapper) must load too
    torch.save(state, path)
    assert set(load_reference_checkpoint(path)) == set(loaded)
