"""The package must guarantee f32-accurate matmuls without clobbering
an embedding application's explicit choice (r4: JAX's TPU default — a
single bf16 matmul pass — corrupted geometry by association-gate
magnitudes; see madicp_tpu/__init__.py and NOTES.md)."""

import jax


def test_package_installs_highest_matmul_precision():
    import madicp_tpu  # noqa: F401

    assert jax.config.jax_default_matmul_precision == "highest"


def test_pipeline_warns_on_degraded_precision():
    """Setting a bf16 tier AFTER import silently reintroduces the r4
    geometry-corruption bug class; Pipeline construction must flag it
    (ADVICE r4)."""
    import warnings

    import pytest

    from madicp_tpu.models.pipeline import Pipeline

    def make():
        return Pipeline(
            sensor_hz=10.0, deskew=False, b_max=0.2, rho_ker=0.1,
            p_th=0.8, b_min=0.1, b_ratio=0.02, num_keyframes=2,
            n_points=256, depth=6, max_leaves=64,
        )

    jax.config.update("jax_default_matmul_precision", "bfloat16")
    try:
        with pytest.warns(RuntimeWarning, match="matmul"):
            make()
    finally:
        jax.config.update("jax_default_matmul_precision", "highest")
    # at the guaranteed tier construction is warning-free
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        make()


def test_explicit_user_precision_is_respected(monkeypatch):
    """Re-running the package's install logic must not overwrite a knob
    the application already set (the install is conditional on the
    default None)."""
    import importlib

    import madicp_tpu

    jax.config.update("jax_default_matmul_precision", "float32")
    try:
        importlib.reload(madicp_tpu)
        assert jax.config.jax_default_matmul_precision == "float32"
    finally:
        jax.config.update("jax_default_matmul_precision", "highest")
