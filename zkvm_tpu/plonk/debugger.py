"""Circuit debugger: source-located constraint traces
(plonk/src/debugger.rs + runtime.rs equivalents).

Subscribes to a Composer's Runtime event bus, resolves the source location
of every witness/constraint via the Python stack (the reference uses the
`backtrace` crate), and on `proof_finished` writes a trace file to the path
in $CDF_OUTPUT (same env contract as the reference's dusk-cdf output;
format here is JSON lines -- one record per event -- rather than CDF).

Usage:
    composer = Composer.initialized()
    debugger = Debugger.attach(composer)
    ... build circuit ...
    composer.runtime.event("proof_finished")     # or debugger.flush(path)
"""

from __future__ import annotations

import json
import os
import traceback

from ..fields import Fr
from .constraint_system import Constraint, Selector, Witness


def _source_location() -> dict:
    """First stack frame outside zkvm_tpu (debugger.rs:23-55 semantics)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for frame in reversed(traceback.extract_stack()):
        if not frame.filename.startswith(here):
            return {"file": frame.filename, "line": frame.lineno,
                    "function": frame.name}
    return {"file": "<unknown>", "line": 0, "function": "<unknown>"}


class Debugger:
    """Event recorder producing a constraint-level trace."""

    def __init__(self):
        self.witnesses: list[dict] = []
        self.constraints: list[dict] = []

    @classmethod
    def attach(cls, composer) -> "Debugger":
        debugger = cls()
        composer.runtime.listeners.append(debugger.event)
        return debugger

    def event(self, kind: str, *payload) -> None:
        if kind == "witness_appended":
            witness, value = payload
            self.witnesses.append({
                "id": witness.index,
                "value": value.to_hex_str(),
                "source": _source_location(),
            })
        elif kind == "constraint_appended":
            constraint: Constraint = payload[0]
            self.constraints.append({
                "id": len(self.constraints),
                "wires": [w.index for w in constraint.witnesses],
                "selectors": {sel.name.lower(): constraint.coeff(sel).to_hex_str()
                              for sel in Selector
                              if not constraint.coeff(sel).is_zero()},
                "source": _source_location(),
            })
        elif kind == "proof_finished":
            path = os.environ.get("CDF_OUTPUT")
            if path:
                self.flush(path)

    def flush(self, path: str) -> None:
        with open(path, "w") as f:
            for record in self.witnesses:
                f.write(json.dumps({"type": "witness", **record}) + "\n")
            for record in self.constraints:
                f.write(json.dumps({"type": "constraint", **record}) + "\n")

    # -- interactive helpers -----------------------------------------------------
    def unsatisfied_constraints(self, composer) -> list[int]:
        """Indexes of arithmetic gates whose polynomial doesn't vanish --
        the debugging question the reference's CDF viewer answers."""
        bad = []
        for i, gate in enumerate(composer.constraints):
            a = composer[gate.a]
            b = composer[gate.b]
            c = composer[gate.c]
            d = composer[gate.d]
            pi = composer.public_inputs.get(i, Fr.zero())
            value = (gate.q_m * a * b + gate.q_l * a + gate.q_r * b
                     + gate.q_o * c + gate.q_f * d + gate.q_c + pi)
            if not (value * gate.q_arith).is_zero():
                bad.append(i)
        return bad
