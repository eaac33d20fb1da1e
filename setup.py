"""Shim for environments whose setuptools predates wheel-free PEP 660
builds (setuptools < 70 needs the `wheel` package for `pip install -e .`;
this file enables the legacy `--no-use-pep517` editable path there).
All metadata lives in pyproject.toml."""

from setuptools import setup

setup()
