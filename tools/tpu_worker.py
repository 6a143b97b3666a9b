"""Long-lived TPU job worker.

This dev image's axon TPU tunnel wedges for ~20-40 min when python processes
attach/detach in quick succession (CLAUDE.md), so ALL device work for a
session funnels through this single process: drop ``<name>.py`` into the jobs
directory and the worker execs it in-process, writing ``<name>.out`` (stdout +
stderr + traceback) and ``<name>.done`` (OK/FAIL). Jobs share the process's
compile cache, so repeated kernel iterations recompile only what changed.

Usage:
    cd /tmp && nohup python -u /root/repo/tools/tpu_worker.py > /tmp/tpu_worker.log 2>&1 &
    echo $! > /tmp/tpu_worker.pid
    cp job.py /tmp/tpu_jobs/      # then poll /tmp/tpu_jobs/job.done
"""

import contextlib
import io
import os
import sys
import time
import traceback

JOBS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)


def main():
    print("tpu_worker: warming up jax…", flush=True)
    import jax

    try:
        # worker processes are disposable (sessions get poisoned by relay
        # hiccups — CLAUDE.md); a persistent compile cache makes the next
        # worker's warmup cheap
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as exc:  # experimental backend: cache is best-effort
        print("tpu_worker: no persistent compile cache:", exc, flush=True)
    print("tpu_worker: devices:", jax.devices(), flush=True)
    seen = set()
    while True:
        names = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
        for name in names:
            base = name[:-3]
            done = os.path.join(JOBS, base + ".done")
            if os.path.exists(done) or name in seen:
                continue
            path_ = os.path.join(JOBS, name)
            try:
                # cp is not atomic: a file copied into the dir can be read
                # half-written; wait until it has been stable for a second
                if time.time() - os.path.getmtime(path_) < 1.0:
                    continue
            except OSError:
                continue
            seen.add(name)
            path = os.path.join(JOBS, name)
            print(f"tpu_worker: running {name}", flush=True)
            # jobs share one process: a job that mutates os.environ (e.g.
            # ENCODER_WEIGHTS_PATH) must not leak config into later jobs —
            # round-5 postmortem: an env leak silently turned a 24L bench
            # row into an 8L one
            env_snapshot = dict(os.environ)
            # line-buffered file, not StringIO: long jobs (training
            # segments) stream progress so the session can watch them
            buf = open(os.path.join(JOBS, base + ".out"), "w", buffering=1)
            ok = True
            t0 = time.time()
            try:
                # edits between jobs must be visible: purge the package from
                # the module cache so each job re-imports current sources
                for mod in [m for m in sys.modules
                            if m.startswith("rassengine_tpu")]:
                    del sys.modules[mod]
                with open(path) as f:
                    src = f.read()
                with contextlib.redirect_stdout(buf), \
                        contextlib.redirect_stderr(buf):
                    exec(compile(src, path, "exec"), {"__name__": "__tpu_job__"})
            except BaseException:
                ok = False
                buf.write("\n" + traceback.format_exc())
            finally:
                # a job that called logging.basicConfig while redirected
                # left root handlers bound to THIS job's buf; drop them or
                # every later job logs into a closed file. With no
                # handlers, logging's lastResort resolves sys.stderr at
                # emit time, which lands in the next job's redirect.
                import logging as _logging
                root = _logging.getLogger()
                for h in root.handlers[:]:
                    root.removeHandler(h)
                os.environ.clear()
                os.environ.update(env_snapshot)
                buf.close()
            dt = time.time() - t0
            with open(done, "w") as f:
                f.write(f"{'OK' if ok else 'FAIL'} {dt:.1f}s\n")
            print(f"tpu_worker: {name} -> {'OK' if ok else 'FAIL'} "
                  f"({dt:.1f}s)", flush=True)
        time.sleep(1.0)


if __name__ == "__main__":
    main()
