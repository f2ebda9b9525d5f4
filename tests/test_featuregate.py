"""Feature-gate registry lifecycle (plans/featuregate.py; reference
semantics at featuregate/registry.go:109-196, flag.go:51-71)."""

import pytest

from opentelemetry_collector_spark.plans import featuregate as fg


def _reg():
    r = fg.Registry()
    r.register("a.alpha", fg.ALPHA, "off by default")
    r.register("b.beta", fg.BETA, "on by default")
    r.register("s.stable", fg.STABLE, to_version="v0.9.0")
    r.register("d.dep", fg.DEPRECATED, to_version="v0.9.0")
    return r


def test_stage_default_states():
    r = _reg()
    assert not r.is_enabled("a.alpha")
    assert r.is_enabled("b.beta")
    assert r.is_enabled("s.stable")
    assert not r.is_enabled("d.dep")


def test_register_validation():
    r = fg.Registry()
    with pytest.raises(fg.GateError, match="empty ID"):
        r.register("", fg.ALPHA)
    with pytest.raises(fg.GateError, match="invalid character"):
        r.register("bad-id", fg.ALPHA)
    with pytest.raises(fg.GateError, match="unknown stage"):
        r.register("x", "gamma")
    with pytest.raises(fg.GateError, match="no removal version"):
        r.register("x", fg.STABLE)
    r.register("x", fg.ALPHA)
    with pytest.raises(fg.GateError, match="already registered"):
        r.register("x", fg.BETA)


def test_set_unknown_and_terminal_stages():
    r = _reg()
    with pytest.raises(fg.GateError, match="no such feature gate"):
        r.set("nope", True)
    # stable cannot be disabled; re-enabling is a no-op
    with pytest.raises(fg.GateError, match="stable, can not be disabled"):
        r.set("s.stable", False)
    r.set("s.stable", True)
    # deprecated cannot be enabled; re-disabling is a no-op
    with pytest.raises(fg.GateError, match="deprecated, can not be enabled"):
        r.set("d.dep", True)
    r.set("d.dep", False)


def test_flag_grammar_and_string():
    r = _reg()
    r.apply_flag("a.alpha,-b.beta")
    assert r.is_enabled("a.alpha") and not r.is_enabled("b.beta")
    r.apply_flag("+b.beta")
    assert r.is_enabled("b.beta")
    r.apply_flag("")  # no-op
    # every failed assignment is reported
    with pytest.raises(fg.GateError, match="no such.*unknown1.*unknown2"):
        r.apply_flag("unknown1,-unknown2")
    assert r.flag_string() == "a.alpha,b.beta,-d.dep,s.stable"


def test_global_registry_engine_gates():
    g = fg.global_registry()
    assert g.is_enabled("engine.aqeSkewJoin")
    assert g.is_enabled("engine.broadcastEnrich")
    assert not g.is_enabled("engine.reliableCheckpoint")


def test_main_flag_rejects_unknown_gate(capsys):
    """--feature-gates fails fast before a session starts."""
    import main as main_mod

    with pytest.raises(fg.GateError, match="no such feature gate"):
        main_mod.main(["--warehouse", "/tmp/x",
                       "--feature-gates", "does.not.exist"])
