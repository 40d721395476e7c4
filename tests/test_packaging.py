"""Packaging parity with the reference's test_packaging.

The reference exposes ``__version__`` from package metadata with a
filesystem fallback (/root/reference/tinymr.py:17-24,
tests/test_packaging.py:6-13).  This repo is exercised straight off
the filesystem (never pip-installed in CI), so the metadata branch is
checked only when the distribution is actually installed.
"""

import importlib.metadata

import pytest

import mr_python_spark


def test_version():
    """``__version__`` is a non-empty dotted version string."""
    assert mr_python_spark.__version__
    parts = mr_python_spark.__version__.split(".")
    assert len(parts) >= 2
    assert all(p.isdigit() for p in parts)


def test_version_matches_metadata_when_installed():
    """When pip-installed, ``__version__`` IS the package metadata."""
    try:
        meta = importlib.metadata.version("mr-python-spark")
    except importlib.metadata.PackageNotFoundError:
        pytest.skip("distribution not installed; filesystem fallback in use")
    assert mr_python_spark.__version__ == meta


def test_pyproject_version_matches_fallback():
    """The pyproject version and the fallback literal stay in sync."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml")) as f:
        m = re.search(r'^version = "([^"]+)"', f.read(), re.MULTILINE)
    assert m, "pyproject.toml has no version"
    assert mr_python_spark.__version__ == m.group(1)
