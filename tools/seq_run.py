import subprocess, sys
for args, log in (
    (["tools/spmv_probe.py", "1024"], "/tmp/spmv_probe.log"),
    (["tools/scale_demo.py", "2304"], "/tmp/scale_demo.log"),
):
    print("RUN", args, flush=True)
    with open(log, "w") as fh:
        subprocess.run([sys.executable] + args, stdout=fh, stderr=subprocess.STDOUT)
