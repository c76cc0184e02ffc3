"""Periodic TPU-tunnel liveness probe (round 4): one line per attempt,
exits as soon as the backend comes up so the driver notification fires."""
import subprocess
import sys
import time

while True:
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax;"
             "jax.config.update('jax_compilation_cache_dir',"
             " '/root/repo/.jax_cache');"
             "d = jax.devices();"
             "print('UP', jax.default_backend(), len(d))"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo")
        if r.returncode == 0:
            line = (r.stdout.strip().splitlines() or ["UP ?"])[-1]
        else:
            tail = r.stderr.strip().splitlines()
            line = f"DOWN rc={r.returncode} " + (tail[-1][:160] if tail else "")
    except subprocess.TimeoutExpired:
        r = None
        line = "DOWN hang>300s"
    print(f"{time.strftime('%H:%M:%S')} [{time.time() - t0:5.1f}s] {line}",
          flush=True)
    if r is not None and r.returncode == 0:
        break
    time.sleep(600)
