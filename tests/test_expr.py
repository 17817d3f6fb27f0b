"""LAMMPS-grammar expression engine (io/expr.py) — edge semantics pinned
against variable.cpp, the round-4 VERDICT weak-#7 fix: `^` precedence and
associativity, unary-over-power binding, fmod `%`, 1.0/0.0 logicals, and
LAMMPS-style error messages (replacing the sandboxed Python eval whose
edges were Python's)."""
import math

import numpy as np
import pytest

from obmd_tpu.io import expr


def ev(s, env=None, resolve=None, backend=None):
    return expr.eval_ast(expr.parse(s), env or {},
                         backend or expr.host_backend(),
                         resolve_var=resolve)


def test_power_binds_below_unary_minus():
    # variable.cpp:137-138: UNARY(8) > CARAT(7), so -2^2 = (-2)^2 = 4
    # (Python's eval gave -(2**2) = -4 — the exact bug this replaces)
    assert ev("-2^2") == 4.0


def test_power_left_associative():
    # variable.cpp:2394 reduces on >=: all binaries left-assoc, incl. ^
    assert ev("2^3^2") == 64.0          # (2^3)^2, not 2^(3^2)=512


def test_precedence_chain():
    assert ev("2+3*4^2") == 50.0
    assert ev("2*3+4") == 10.0
    assert ev("2^2*3") == 12.0


def test_modulo_is_fmod():
    # variable.cpp:2426 fmod; Python's floored % gives +1 here
    assert ev("-5 % 3") == pytest.approx(-2.0)
    assert ev("5 % -3") == pytest.approx(2.0)


def test_logicals_are_unit_doubles():
    assert ev("3 > 2") == 1.0
    assert ev("3 < 2") == 0.0
    assert ev("1 && 0") == 0.0
    assert ev("1 || 0") == 1.0
    assert ev("!0") == 1.0
    assert ev("!5") == 0.0
    assert ev("1 ^| 1") == 0.0          # LAMMPS xor
    assert ev("1 ^| 0") == 1.0
    assert ev("2 == 2.0") == 1.0
    assert ev("(1 < 2) + (3 >= 3)") == 2.0


def test_log_is_log10_ln_is_natural():
    assert ev("log(100)") == pytest.approx(2.0)
    assert ev("ln(exp(1))") == pytest.approx(1.0)


def test_functions_and_constants():
    assert ev("sqrt(2)^2") == pytest.approx(2.0)
    assert ev("sin(PI/2)", {"PI": math.pi}) == pytest.approx(1.0)
    assert ev("atan2(1, 1)") == pytest.approx(math.pi / 4)
    assert ev("floor(2.7) + ceil(2.2)") == 5.0


def test_scientific_numbers():
    assert ev("1.5e3 + 2E-2") == pytest.approx(1500.02)
    assert ev(".5*4") == 2.0


def test_lammps_style_errors():
    with pytest.raises(expr.ExprError, match="Divide by zero"):
        ev("1/0")
    with pytest.raises(expr.ExprError, match="Modulo 0"):
        ev("1%0")
    with pytest.raises(expr.ExprError, match="Sqrt of negative"):
        ev("sqrt(-1)")
    with pytest.raises(expr.ExprError, match="Log of zero/negative"):
        ev("ln(0)")
    with pytest.raises(expr.ExprError, match="Invalid math function"):
        ev("frobnicate(1)")
    with pytest.raises(expr.ExprError, match="Invalid syntax"):
        ev("1 +")
    with pytest.raises(expr.ExprError, match="Invalid syntax"):
        ev("(1+2")
    with pytest.raises(expr.ExprError, match="Invalid"):
        ev("nosuchthing + 1")


def test_variable_references_recurse():
    vals = {"a": 3.0, "b": "4"}

    def resolve(name):
        v = vals[name]
        return float(v) if isinstance(v, str) else v
    assert ev("v_a * v_b", resolve=resolve) == 12.0


def test_numpy_backend_arrays():
    env = {"x": np.asarray([1.0, -2.0, 3.0]),
           "vx": np.asarray([0.5, 0.5, -1.0])}
    out = ev("(x > 0) && (vx > 0)", env, backend=expr.numpy_backend())
    np.testing.assert_allclose(out, [1.0, 0.0, 0.0])
    out = ev("-x^2", env, backend=expr.numpy_backend())
    np.testing.assert_allclose(out, [1.0, 4.0, 9.0])   # (-x)^2


def test_deck_suite_expression_shapes():
    """The expressions the committed decks actually use keep their values
    (regression vs the old engine on its agreed subset)."""
    env = {"PI": math.pi, "time": 2.0, "step": 200, "dt": 0.01}
    assert ev("0.5*sin(2*PI*time)", env) == pytest.approx(
        0.5 * math.sin(2 * math.pi * 2.0))
    assert ev("step*dt", env) == pytest.approx(2.0)
    assert ev("MIN(3, 5) + MAX(1, 2)", env) == 5.0
