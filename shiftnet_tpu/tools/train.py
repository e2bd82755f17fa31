"""Training CLI — replaces ``basicsr/train1.py`` / ``train2.py``.

Usage:  python -m shiftnet_tpu.tools.train -opt configs/gopro_deblur.yml
"""
import argparse

from shiftnet_tpu.train.trainer import Trainer
from shiftnet_tpu.utils.config import load_config


def main():
    from shiftnet_tpu.utils.jaxenv import setup_jax
    setup_jax()
    ap = argparse.ArgumentParser()
    ap.add_argument('-opt', required=True, help='path to yaml config')
    args = ap.parse_args()
    opt = load_config(args.opt, is_train=True)
    Trainer(opt).run()


if __name__ == '__main__':
    main()
