"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multichip
path; bench.py runs on the real chip).
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the real-TPU
# tunnel) and its sitecustomize re-asserts it via jax.config at plugin
# registration, so the env var alone is not enough — update the config
# after import. Tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Directory of generated .ogg test vectors + golden PCM (lazy, cached).

    Mirrors the reference's dev/cmp asset corpus, but generated in-repo with
    libvorbisenc/libvorbisfile via ctypes (no network).
    """
    from tools import corpus

    root = os.path.join(os.path.dirname(__file__), "data", "corpus")
    corpus.ensure_corpus(root)
    return root
