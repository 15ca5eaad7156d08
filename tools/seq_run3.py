import subprocess, sys
for n in ("1024", "1536", "2048"):
    print("RUN scale_demo", n, flush=True)
    with open(f"/tmp/scale_{n}.log", "w") as fh:
        rc = subprocess.run([sys.executable, "tools/scale_demo.py", n], stdout=fh, stderr=subprocess.STDOUT).returncode
    print("rc", rc, flush=True)
    if rc != 0:
        break
