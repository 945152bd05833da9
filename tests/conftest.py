"""Test configuration.

The container's sitecustomize registers the axon TPU backend at
interpreter start and pins it as the default platform, so JAX_PLATFORMS
cannot be overridden from here. Instead we (a) ensure the CPU client
exposes 8 virtual devices (XLA_FLAGS is read lazily at CPU-client init)
and (b) route all test computation to CPU via jax.default_device, which
keeps tests fast, deterministic, and able to exercise multi-device
sharding without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Disable the small-workload CPU auto-route (engine._route_backend):
# every test input is tiny, so with the real TPU platform visible the
# whole calc surface would silently shift to the native CPU tile engine
# and stop exercising the XLA sweep path. Tests that want the native
# engine opt in with backend="cpu" (tests/test_cpu_engine.py).
os.environ.setdefault("TWK_CPU_ROUTE_WORK", "0")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _cpu_default_device():
    import jax
    with jax.default_device(jax.devices("cpu")[0]):
        yield


def cpu_devices(n=None):
    import jax
    devs = jax.devices("cpu")
    return devs if n is None else devs[:n]
