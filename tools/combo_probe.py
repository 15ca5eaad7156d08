import subprocess, sys
for cmd in (
    [sys.executable, "tools/mg_pallas_probe.py", "128", "512"],
    [sys.executable, "tools/grid_strip_sweep2.py"],
):
    print("RUN", cmd, flush=True)
    subprocess.run(cmd)
