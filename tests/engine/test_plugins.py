"""Plugin-system tests (reference: vllm/plugins load_general_plugins +
VLLM_PLUGINS allowlist)."""

import os
from types import SimpleNamespace
from unittest import mock

import lvllm_tpu.plugins as plugins


def _ep(name, obj):
    return SimpleNamespace(name=name, load=lambda: obj)


def test_load_plugins_registers_models_and_runs_hooks(monkeypatch):
    ran = []

    class FakeModel:
        pass

    def fake_iter(group):
        if group == plugins.MODEL_GROUP:
            return [_ep("MyPluginArch", FakeModel)]
        return [_ep("hook", lambda: ran.append(True))]

    monkeypatch.setattr(plugins, "_iter_entry_points", fake_iter)
    loaded = plugins.load_plugins(force=True)
    assert ran == [True]
    assert loaded["MyPluginArch"] is FakeModel

    from lvllm_tpu.models.registry import get_model_class
    assert get_model_class("MyPluginArch") is FakeModel


def test_allowlist(monkeypatch):
    calls = []

    def fake_iter(group):
        if group == plugins.PLUGIN_GROUP:
            return [_ep("yes", lambda: calls.append("yes")),
                    _ep("no", lambda: calls.append("no"))]
        return []

    monkeypatch.setattr(plugins, "_iter_entry_points", fake_iter)
    with mock.patch.dict(os.environ, {"LVLLM_PLUGINS": "yes"}):
        plugins.load_plugins(force=True)
    assert calls == ["yes"]


def test_broken_plugin_does_not_raise(monkeypatch):
    def boom():
        raise RuntimeError("broken plugin")

    def fake_iter(group):
        return [_ep("bad", boom)] if group == plugins.PLUGIN_GROUP else []

    monkeypatch.setattr(plugins, "_iter_entry_points", fake_iter)
    plugins.load_plugins(force=True)  # must not raise
