"""Torch <-> JAX parameter conversion for GShiftNet.

The reference saves checkpoints as ``{'params': state_dict}`` ``.pth`` files
(``basicsr/models/base_model.py:193-224``).  Our flax module tree mirrors the
torch attribute paths (Sequential indices encoded as ``__<i>``), so conversion
is a mechanical per-leaf key rewrite:

  flax ('stage1', 'decoder_level1_1', 'encoder_level1_2__0', 'body__0',
        'conv', 'kernel')
  -> torch 'stage1.decoder_level1_1.encoder_level1_2.0.body.0.weight'

Leaf rules:
  - conv ``kernel`` (HWIO) <-> torch ``weight`` (OIHW): transpose (3,2,0,1).
  - the inner ``conv`` path component (our Conv2d wrapper) is dropped.
  - PReLU / LayerNorm2d ``weight``/``bias`` map 1:1.
  - CAB1/CAB2 ``beta``: (1,1,1,C) <-> torch (1,C,1,1).
"""
from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np

_SEQ_IDX = re.compile(r'__(\d+)')


def flax_path_to_torch_key(path: tuple[str, ...]) -> str:
    """Map a flax param path (module names + leaf) to the torch state_dict key."""
    parts = []
    n = len(path)
    for i, comp in enumerate(path):
        if comp == 'conv' and i == n - 2:
            continue  # our Conv2d wrapper level; torch has the conv inline
        comp = _SEQ_IDX.sub(r'.\1', comp)
        parts.append(comp)
    leaf = parts.pop()
    if leaf == 'kernel':
        leaf = 'weight'
    return '.'.join(parts + [leaf])


def _to_torch_array(path: tuple[str, ...], value: np.ndarray) -> np.ndarray:
    leaf = path[-1]
    if leaf == 'kernel':
        return np.transpose(value, (3, 2, 0, 1))  # HWIO -> OIHW
    if leaf == 'beta':
        return np.transpose(value, (0, 3, 1, 2))  # (1,1,1,C) -> (1,C,1,1)
    if leaf == 'weight' and path[-2].startswith(('body__1', 'down01__1',
                                                 'down__1', 'act', 'lrelu')):
        return value  # PReLU (1,)
    return value


def _from_torch_array(path: tuple[str, ...], value: np.ndarray) -> np.ndarray:
    leaf = path[-1]
    if leaf == 'kernel':
        return np.transpose(value, (2, 3, 1, 0))  # OIHW -> HWIO
    if leaf == 'beta':
        return np.transpose(value, (0, 2, 3, 1))  # (1,C,1,1) -> (1,1,1,C)
    return value


def _flatten(tree: Any, prefix: tuple[str, ...] = ()) -> dict[tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict[tuple[str, ...], Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for comp in path[:-1]:
            node = node.setdefault(comp, {})
        node[path[-1]] = v
    return tree


def flax_to_torch_state(params: dict) -> dict[str, np.ndarray]:
    """Flax param tree -> torch-keyed numpy state dict."""
    flat = _flatten(params)
    return {
        flax_path_to_torch_key(path): _to_torch_array(path, np.asarray(v))
        for path, v in flat.items()
    }


def torch_state_to_flax(state: dict[str, np.ndarray], params_template: dict,
                        strict: bool = True) -> dict:
    """Torch-keyed numpy state dict -> flax param tree shaped like the template.

    ``state`` values may be torch tensors or numpy arrays.  With ``strict``,
    every template leaf must be found in ``state`` and shapes must match.
    """
    flat_tpl = _flatten(params_template)
    out = {}
    missing = []
    for path, tpl in flat_tpl.items():
        key = flax_path_to_torch_key(path)
        if key not in state:
            missing.append(key)
            continue
        v = state[key]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, 'detach') else v,
                       dtype=np.float32)
        v = _from_torch_array(path, v)
        tpl_shape = tuple(getattr(tpl, 'shape', None) or np.shape(tpl))
        if tuple(v.shape) != tpl_shape:
            raise ValueError(
                f'shape mismatch for {key}: torch {v.shape} vs flax {tpl_shape}')
        out[path] = v
    if missing and strict:
        raise KeyError(f'{len(missing)} torch keys missing, e.g. {missing[:5]}')
    return _unflatten(out)


def load_reference_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a reference ``.pth`` checkpoint ({'params': state_dict})."""
    import torch  # CPU torch, conversion-time only

    blob = torch.load(path, map_location='cpu', weights_only=True)
    state = blob.get('params', blob)
    return {k: v.numpy() for k, v in state.items()}
