"""Packaging metadata sanity: the installable surface a reference user gets
(`pip install -e .`) matches the repo — console entry point resolves, the
declared dependencies are the ones the package imports, and the native
loader honors DRNMF_NATIVE_DIR for installed (non-checkout) layouts."""

import importlib
import os
import subprocess
import sys
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _project():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]


def test_console_entry_point_resolves():
    proj = _project()
    target = proj["scripts"]["drnmf-tpu"]
    mod_name, func_name = target.split(":")
    mod = importlib.import_module(mod_name)
    fn = getattr(mod, func_name)
    assert callable(fn)


def test_declared_dependencies_are_importable():
    proj = _project()
    canon = {"pyyaml": "yaml"}
    for dep in proj["dependencies"]:
        name = dep.split("[")[0].split(">")[0].split("=")[0].strip()
        importlib.import_module(canon.get(name, name.replace("-", "_")))


def test_packages_find_covers_all_subpackages():
    from setuptools import find_packages

    found = set(find_packages(where=REPO, include=["drnmf_tpu*"]))
    on_disk = {"drnmf_tpu"}
    for root, dirs, files in os.walk(os.path.join(REPO, "drnmf_tpu")):
        if "__init__.py" in files:
            rel = os.path.relpath(root, REPO).replace(os.sep, ".")
            on_disk.add(rel)
    assert found == on_disk


def test_native_dir_env_override(tmp_path):
    # A fresh interpreter with DRNMF_NATIVE_DIR pointing at an empty dir must
    # resolve the .so path there (and so report the fast path unavailable,
    # falling back to scipy) without touching the checkout's native/.
    code = (
        "import os; from drnmf_tpu.data import native_loader as nl; "
        "print(os.path.dirname(nl._SO_PATH))"
    )
    env = dict(os.environ, DRNMF_NATIVE_DIR=str(tmp_path), JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, check=True, cwd=REPO,
    )
    assert out.stdout.strip() == str(tmp_path)
