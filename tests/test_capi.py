"""Build + run the C ABI test program (tests/test_capi.c) against
libkanzitpu_capi.so — the analog of the reference's TestAPI.c run.
Skipped when a C toolchain or the Python embed library is missing."""

import os
import shutil
import subprocess
import sys
import sysconfig

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")


def _embed_flags():
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    ver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    return inc, libdir, ver


@pytest.mark.timeout(300)
def test_capi_roundtrip(tmp_path):
    gxx = shutil.which("g++")
    gcc = shutil.which("gcc")
    if not (gxx and gcc):
        pytest.skip("no C/C++ toolchain")
    inc, libdir, ver = _embed_flags()
    if not os.path.exists(os.path.join(libdir, f"lib{ver}.so")):
        pytest.skip("libpython shared library not available")

    so = tmp_path / "libkanzitpu_capi.so"
    r = subprocess.run(
        [gxx, "-O2", "-shared", "-fPIC",
         os.path.join(NATIVE, "capi.cpp"), f"-I{inc}", f"-L{libdir}",
         f"-l{ver}", "-ldl", "-o", str(so)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1500:]

    exe = tmp_path / "test_capi"
    r = subprocess.run(
        [gcc, "-O2", os.path.join(REPO, "tests", "test_capi.c"),
         f"-I{NATIVE}", str(so), f"-L{libdir}", f"-l{ver}",
         f"-Wl,-rpath,{libdir}", f"-Wl,-rpath,{tmp_path}",
         "-o", str(exe)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1500:]

    env = dict(os.environ)
    env["KANZI_TPU_PYROOT"] = REPO
    env["KANZI_TPU_DISABLE"] = "1"          # no TPU in CI
    env.pop("PYTHONPATH", None)
    r = subprocess.run([str(exe)], cwd=tmp_path, env=env,
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, \
        f"rc={r.returncode}\n{r.stdout[-500:]}\n{r.stderr[-1500:]}"
    assert "CAPI-OK" in r.stdout

    # the container the C API wrote is a normal kanzi stream: decode it
    # with the Python reader too
    sys.path.insert(0, REPO)
    from kanzi_tpu.io.compressed_stream import decompress_bytes
    blob = (tmp_path / "capi_test.knz").read_bytes()
    out = decompress_bytes(blob)
    assert len(out) == 300000
