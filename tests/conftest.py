import os
import sys

# Tests must run on a virtual 8-device CPU mesh (SURVEY.md §4: sharding
# tests on a CPU mesh; golden tests compare code paths, not TPU numerics).
# The driver environment initializes a remote-TPU PJRT plugin from
# sitecustomize at interpreter startup (before conftest runs), so setting
# env vars here is too late — re-exec pytest once with a CPU-only env.
if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",) and \
        os.environ.get("AKARI_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["AKARI_TEST_REEXEC"] = "1"
    # disable the TPU plugin bootstrap in sitecustomize
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
    )

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
