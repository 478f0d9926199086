"""The FUSE_MEANPOOL shipping contract (round 4).

The fused conv+mean_pool rewrite is the shipped default (chip A/B:
flagship 24.5 -> 14.8 ms/iter, VALIDATION.md "FUSE_MEANPOOL chip A/B");
``CTGAN_FUSE_MEANPOOL=0`` is the opt-out and must win over app configs so
any tool can A/B the unfused path without plumbing
(``blocks.set_fuse_meanpool``).  Reference context: the TF-1.2 blocks it
replaces are ``CT_gan_cifar_resnet.py:89-153`` (ConvMeanPool/MeanPoolConv).
"""

import importlib
import os
import subprocess
import sys

from ctgan_tpu.models import blocks


class TestFuseMeanpoolDefault:
    def test_default_is_fused(self, monkeypatch):
        # A fresh import with no env var set ships fused.
        monkeypatch.delenv("CTGAN_FUSE_MEANPOOL", raising=False)
        code = (
            "from ctgan_tpu.models import blocks; "
            "assert blocks.FUSE_MEANPOOL_CONV is True, blocks.FUSE_MEANPOOL_CONV"
        )
        env = dict(os.environ)
        env.pop("CTGAN_FUSE_MEANPOOL", None)
        subprocess.run([sys.executable, "-c", code], check=True, env=env)

    def test_env_opt_out_wins_over_app_config(self, monkeypatch):
        monkeypatch.setenv("CTGAN_FUSE_MEANPOOL", "0")
        old = blocks.FUSE_MEANPOOL_CONV
        try:
            blocks.FUSE_MEANPOOL_CONV = False  # what a fresh import would see
            blocks.set_fuse_meanpool(True)  # app config asks for fused
            assert blocks.FUSE_MEANPOOL_CONV is False
        finally:
            blocks.FUSE_MEANPOOL_CONV = old

    def test_env_opt_in_wins_over_app_config(self, monkeypatch):
        monkeypatch.setenv("CTGAN_FUSE_MEANPOOL", "1")
        old = blocks.FUSE_MEANPOOL_CONV
        try:
            blocks.FUSE_MEANPOOL_CONV = True
            blocks.set_fuse_meanpool(False)  # app config asks for unfused
            assert blocks.FUSE_MEANPOOL_CONV is True
        finally:
            blocks.FUSE_MEANPOOL_CONV = old

    def test_app_config_applies_when_env_unset(self, monkeypatch):
        monkeypatch.delenv("CTGAN_FUSE_MEANPOOL", raising=False)
        old = blocks.FUSE_MEANPOOL_CONV
        try:
            blocks.set_fuse_meanpool(False)
            assert blocks.FUSE_MEANPOOL_CONV is False
            blocks.set_fuse_meanpool(True)
            assert blocks.FUSE_MEANPOOL_CONV is True
        finally:
            blocks.FUSE_MEANPOOL_CONV = old
