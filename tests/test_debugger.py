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
    from zkvm_tpu.plonk.constraint_system import Selector
    assert record["selectors"][Selector.MULTIPLICATION] == Fr(1)


def test_cdf_binary_roundtrip(tmp_path, monkeypatch):
    from zkvm_tpu.plonk.cdf import read_cdf

    out = tmp_path / "trace.cdf"
    monkeypatch.setenv("CDF_OUTPUT", str(out))
    composer = Composer.initialized()
    Debugger.attach(composer)
    a, b = _build(composer)
    composer.runtime.event("proof_finished")

    data = read_cdf(str(out))
    assert len(data["constraints"]) == 1
    con = data["constraints"][0]
    assert con["selectors"]["qm"] == Fr(1).to_bytes()
    # gate_mul allocates the output o = a*b, so the gate is satisfied
    assert con["evaluation"] is True
    assert con["witnesses"][0] == a.index
    assert con["witnesses"][1] == b.index
    # witness values round-trip as canonical 32-byte scalars
    by_id = {w["id"]: w["value"] for w in data["witnesses"]}
    assert by_id[a.index] == Fr(3).to_bytes()
    assert by_id[b.index] == Fr(5).to_bytes()
    # context section embeds this test file (self-contained trace)
    assert any(name.endswith("test_debugger.py") for name in data["files"])


def test_cdf_unsatisfied_evaluation_flag(tmp_path):
    from zkvm_tpu.plonk.cdf import read_cdf

    composer = Composer.initialized()
    debugger = Debugger.attach(composer)
    a = composer.append_witness(Fr(3))
    # claim a * a == 10 (false): evaluation flag must be False in the CDF
    composer.append_gate(Constraint().mult(1).constant(-Fr(10)).a(a).b(a))
    out = tmp_path / "bad.cdf"
    debugger.flush(str(out))
    data = read_cdf(str(out))
    flags = [c["evaluation"] for c in data["constraints"]]
    assert flags[-1] is False


def test_cdf_golden_fixture():
    """Layout pin: the committed fixture parses to known content."""
    import os

    from zkvm_tpu.plonk.cdf import read_cdf

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "trace_v1.cdf")
    data = read_cdf(path)
    assert data["config"]["version"] == "1"
    assert [w["id"] for w in data["witnesses"]] == [0, 1]
    assert data["witnesses"][0]["value"] == Fr(7).to_bytes()
    assert len(data["constraints"]) == 1
    con = data["constraints"][0]
    assert con["witnesses"] == (0, 1, 0, 0)
    assert con["selectors"]["ql"] == Fr(2).to_bytes()
    assert con["evaluation"] is True
    assert con["source"] == {"line": 42, "col": 3, "file": "circuit.py"}


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
