"""File-driven profiling REPL: keeps the 2.2M index resident and executes
python snippets dropped into /tmp/prof_cmd_N.py, appending stdout to
/tmp/prof_out.log. Poll loop; exits on /tmp/prof_stop."""
import os, sys, time, traceback, io, contextlib

LOG = "/tmp/prof_out.log"

def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")

with open(LOG, "w") as f:
    f.write("=== prof driver boot ===\n")

try:
    exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "prof_setup.py")).read(), globals())
    log("SETUP DONE")
except Exception:
    log("SETUP FAILED:\n" + traceback.format_exc())
    sys.exit(1)

seen = set()
while not os.path.exists("/tmp/prof_stop"):
    for i in range(1000):
        p = f"/tmp/prof_cmd_{i}.py"
        if i in seen or not os.path.exists(p):
            continue
        seen.add(i)
        log(f"--- cmd_{i} start ---")

        class _Live(io.TextIOBase):
            def write(self, s):
                with open(LOG, "a") as f:
                    f.write(s)
                return len(s)
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(_Live()):
                exec(open(p).read(), globals())
        except Exception:
            log(traceback.format_exc())
        log(f"--- cmd_{i} done ({time.time()-t0:.1f}s) ---")
    time.sleep(0.5)
log("driver exit")
