"""Debugger / runtime event bus tests (plonk runtime.rs + debugger.rs)."""

import json
import os

from zkvm_tpu.fields import Fr
from zkvm_tpu.plonk import Composer, Constraint
from zkvm_tpu.plonk.debugger import Debugger


def _build(composer):
    a = composer.append_witness(Fr(3))
    b = composer.append_witness(Fr(5))
    composer.gate_mul(Constraint().mult(1).a(a).b(b))
    return a, b


def test_debugger_records_events():
    composer = Composer.initialized()
    debugger = Debugger.attach(composer)
    _build(composer)
    assert len(debugger.witnesses) == 3  # a, b, product output
    assert len(debugger.constraints) == 1
    record = debugger.constraints[0]
    assert record["source"]["file"].endswith("test_debugger.py")
    assert "multiplication" in record["selectors"]


def test_cdf_output_env(tmp_path, monkeypatch):
    out = tmp_path / "trace.cdf.jsonl"
    monkeypatch.setenv("CDF_OUTPUT", str(out))
    composer = Composer.initialized()
    Debugger.attach(composer)
    _build(composer)
    composer.runtime.event("proof_finished")
    lines = [json.loads(line) for line in out.read_text().splitlines()]
    kinds = {line["type"] for line in lines}
    assert kinds == {"witness", "constraint"}


def test_unsatisfied_constraints():
    composer = Composer.initialized()
    debugger = Debugger.attach(composer)
    a = composer.append_witness(Fr(3))
    # claim a * a == 10 (false)
    composer.append_gate(Constraint().mult(1).constant(-Fr(10)).a(a).b(a))
    bad = debugger.unsatisfied_constraints(composer)
    assert len(bad) == 1
    # fixing the constant satisfies it
    composer2 = Composer.initialized()
    a2 = composer2.append_witness(Fr(3))
    composer2.append_gate(Constraint().mult(1).constant(-Fr(9)).a(a2).b(a2))
    assert Debugger().unsatisfied_constraints(composer2) == []
