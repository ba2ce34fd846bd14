"""App entry-point smoke tests (CLI shape parity with the reference)."""

import tempfile

import pytest


def test_scene_text_telescope_cli_train_and_eval():
    from fudanocr_tpu.apps.scene_text_telescope.main import main

    with tempfile.TemporaryDirectory() as tmp:
        main(["--arch", "tbsrn", "--srb", "1", "--hd_u", "4",
              "--batch_size", "8", "--epochs", "1",
              "--options", "TRAIN.synthetic_samples=16",
              "TRAIN.width=64", "TRAIN.height=16",
              f"TRAIN.ckpt_dir={tmp}",
              "TRAIN.VAL.valInterval=1000000"])


def test_text_gestalt_cli_eval_only():
    from fudanocr_tpu.apps.text_gestalt.main import main

    with tempfile.TemporaryDirectory() as tmp:
        main(["--arch", "tsrn", "--srb", "1", "--hd_u", "4",
              "--batch_size", "8", "--test",
              "--options", "TRAIN.synthetic_samples=16",
              "TRAIN.width=64", "TRAIN.height=16",
              f"TRAIN.ckpt_dir={tmp}"])
