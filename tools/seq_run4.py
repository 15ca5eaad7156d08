import subprocess, sys
for n in ("512", "1024", "1536"):
    print("RUN scale_demo", n, flush=True)
    with open(f"/tmp/scale_t{n}.log", "w") as fh:
        subprocess.run([sys.executable, "tools/scale_demo.py", n], stdout=fh, stderr=subprocess.STDOUT)
