"""Shared wiring for the two SR apps (scene-text-telescope / text-gestalt).

Mirrors the reference entry shape — `main.py --arch tbsrn --STN
--text_focus [--test|--demo]` reading config/super_resolution.yaml
(scene-text-telescope/main.py:8-40) — on top of the unified Config system.
Falls back to the synthetic TextZoom generator when no dataset paths are
configured, so every path is runnable out of the box.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp

from fudanocr_tpu.core.config import Config, load_config, merge_cli_overrides

DEFAULTS = Config({
    "TRAIN": {
        "train_data_dir": [], "batch_size": 64, "width": 128, "height": 32,
        "epochs": 2, "lr": 1e-4, "beta1": 0.5, "manualSeed": 1234,
        "max_len": 100, "down_sample_scale": 2, "ckpt_dir": "./ckpt/",
        "synthetic_samples": 512,
        "displayInterval": 50, "saveInterval": 200, "voc_type": "all",
        "VAL": {"val_data_dir": [], "valInterval": 1000,
                "crnn_pretrained": "", "n_vis": 10, "vis_dir": "demo"},
    },
    "TEST": {"checkpoint": "", "test_data_dir": []},
})


def build_argparser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--arch", default="tbsrn",
                   choices=["tbsrn", "tsrn", "srcnn", "srresnet", "edsr",
                            "rdn", "esrgan"])
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--test", action="store_true")
    p.add_argument("--demo", action="store_true")
    p.add_argument("--STN", action="store_true")
    p.add_argument("--mask", action="store_true")
    p.add_argument("--text_focus", action="store_true")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--srb", type=int, default=5)
    p.add_argument("--hd_u", type=int, default=32)
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--options", nargs="*", default=[],
                   help="dotted-key config overrides, e.g. TRAIN.lr=2e-4")
    return p


def load_app_config(args) -> Config:
    cfg = DEFAULTS
    if args.config and os.path.exists(args.config):
        import copy
        cfg = Config({**copy.deepcopy(DEFAULTS).to_dict(),
                      **load_config(args.config).to_dict()})
    cfg = merge_cli_overrides(cfg, args.options)
    if args.batch_size:
        cfg.TRAIN.batch_size = args.batch_size
    if args.epochs:
        cfg.TRAIN.epochs = args.epochs
    return cfg


def build_sr_model(args, cfg):
    from fudanocr_tpu.models import sr as sr_models

    kw = dict(scale_factor=cfg.TRAIN.down_sample_scale,
              width=cfg.TRAIN.width, height=cfg.TRAIN.height,
              mask=args.mask)
    arch = args.arch
    if arch == "tbsrn":
        return sr_models.TBSRN(stn=args.STN, srb_nums=args.srb,
                               hidden_units=args.hd_u, **kw)
    if arch == "tsrn":
        return sr_models.TSRN(stn=args.STN, srb_nums=args.srb,
                              hidden_units=args.hd_u, **kw)
    return sr_models.build_baseline(arch, **kw)


def build_dataset(data_dirs, cfg, train: bool):
    if data_dirs:
        from fudanocr_tpu.data.lmdb_dataset import PairedLMDBDataset
        return PairedLMDBDataset(data_dirs,
                                 voc_type=cfg.TRAIN.voc_type,
                                 batch_hw=(cfg.TRAIN.height, cfg.TRAIN.width),
                                 scale=cfg.TRAIN.down_sample_scale)
    from fudanocr_tpu.data.synthetic import SyntheticTextZoom
    logging.getLogger("fudanocr_tpu").warning(
        "no dataset dirs configured; using the synthetic TextZoom generator")
    n = cfg.TRAIN.synthetic_samples
    return SyntheticTextZoom(num_samples=n if train else max(n // 4, 8),
                             hr_size=(cfg.TRAIN.width, cfg.TRAIN.height),
                             scale=cfg.TRAIN.down_sample_scale)
