"""The package must guarantee f32-accurate matmuls without clobbering
an embedding application's explicit choice (r4: JAX's TPU default — a
single bf16 matmul pass — corrupted geometry by association-gate
magnitudes; see madicp_tpu/__init__.py and NOTES.md)."""

import jax


def test_package_installs_highest_matmul_precision():
    import madicp_tpu  # noqa: F401

    assert jax.config.jax_default_matmul_precision == "highest"


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
