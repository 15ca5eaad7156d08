import subprocess, sys
for args, log in (
    (["tools/grid_asm_probe.py", "tpu", "128", "512", "1024"], "/tmp/grid_asm_bl.log"),
    (["tools/mg_pallas_probe.py", "128", "512"], "/tmp/mg_pallas_bl.log"),
    (["tools/scale_demo.py", "2304"], "/tmp/scale_demo.log"),
):
    print("RUN", args, flush=True)
    with open(log, "w") as fh:
        subprocess.run([sys.executable] + args, stdout=fh, stderr=subprocess.STDOUT)
