"""Run a python script on the TPU, retrying backend init until the chip's
claim cooldown expires (the tunnelled chip admits one process at a time;
after a process exits/faults there is an unpredictable cooldown).

Usage: python scripts/tpu_run.py <script.py> [args...]
"""
import subprocess, sys, time

def wait_backend(max_tries=20, sleep_s=120):
    """Long quiet sleeps: rapid claim attempts appear to reset the chip's
    cooldown after a fault — poll gently."""
    for i in range(max_tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=180)
            if r.returncode == 0:
                print(f"[tpu_run] backend up (try {i})", flush=True)
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(sleep_s)
    return False

if __name__ == "__main__":
    if not wait_backend():
        print("[tpu_run] backend never came up", flush=True)
        sys.exit(2)
    sys.exit(subprocess.run([sys.executable] + sys.argv[1:]).returncode)
