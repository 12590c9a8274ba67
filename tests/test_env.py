"""core/env.py: seeding + user-module plugin mechanism."""

import os
import random
import sys

import numpy as np
import pytest

from transformer_mm_explainability_tpu.core import env
from transformer_mm_explainability_tpu.core.registry import registry


def test_set_seed_deterministic():
    assert env.set_seed(None) is None
    assert env.set_seed(0) == 0  # falsy → no seeding, passthrough

    env.set_seed(1234)
    a = (np.random.rand(3), random.random())
    env.set_seed(1234)
    b = (np.random.rand(3), random.random())
    np.testing.assert_array_equal(a[0], b[0])
    assert a[1] == b[1]

    # -1 resolves to an entropy seed, returned for PRNGKey threading
    s = env.set_seed(-1)
    assert isinstance(s, int) and s != -1


def test_import_user_module_registers_plugin(tmp_path, monkeypatch):
    plugin = tmp_path / "my_mmf_plugin"
    plugin.mkdir()
    (plugin / "__init__.py").write_text(
        "from transformer_mm_explainability_tpu.core.registry import "
        "registry\n"
        "@registry.register_model('user_plugin_model')\n"
        "class UserPluginModel:\n"
        "    pass\n")
    try:
        env.import_user_module(str(plugin))
        assert registry.get("model", "user_plugin_model").__name__ == \
            "UserPluginModel"
        # the mmf_user_dir alias points at the imported module
        assert sys.modules["mmf_user_dir"].__name__ == "my_mmf_plugin"
        # sys.path is restored (no lingering parent entry)
        assert str(tmp_path) not in sys.path
    finally:
        registry._namespaces["model"].pop("user_plugin_model", None)
        sys.modules.pop("my_mmf_plugin", None)
        sys.modules.pop("mmf_user_dir", None)

    env.import_user_module("")  # no-op


def test_import_user_module_restores_shadowed(tmp_path):
    import types

    shadowed = types.ModuleType("json")  # pretend a stdlib clash
    orig = sys.modules["json"]
    plugin = tmp_path / "json"
    plugin.mkdir()
    (plugin / "__init__.py").write_text("PLUGIN = True\n")
    try:
        env.import_user_module(str(plugin))
        # original module restored under its own name...
        assert sys.modules["json"] is orig
        # ...while the plugin lives on under the alias
        assert sys.modules["mmf_user_dir"].PLUGIN is True
    finally:
        sys.modules["json"] = orig
        sys.modules.pop("mmf_user_dir", None)


def test_import_files(tmp_path, monkeypatch):
    pkg = tmp_path / "toolpkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "mod_a.py").write_text("VALUE = 'a'\n")
    (pkg / "_private.py").write_text("raise RuntimeError('skipped')\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    env.import_files(str(pkg / "__init__.py"), "toolpkg")
    assert sys.modules["toolpkg.mod_a"].VALUE == "a"
    assert "toolpkg._private" not in sys.modules
    sys.modules.pop("toolpkg.mod_a", None)
    sys.modules.pop("toolpkg", None)


def test_setup_imports_idempotent():
    env.setup_imports()
    assert registry.get_state("imports_setup") is True
    # built-ins registered via zoo
    assert "visual_bert" in registry.list("model")
    env.setup_imports()  # second call is a no-op
