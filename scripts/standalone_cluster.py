#!/usr/bin/env python
"""Local Spark standalone cluster: one master + N single-core worker JVMs,
each pinned to its own CPU. The closest sandbox realization of "N executors
vs 4N executors": every executor is a separate OS process with its own heap,
GC, shuffle server and Python workers, talking over loopback.

Used by run_scaling.py --standalone. Public Spark deploy scripts only.
"""

from __future__ import annotations

import os
import socket
import subprocess
import time

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_PORT = 7077


def _spark_class(*args, cpus: str | None = None, env_extra: dict | None = None):
    env = dict(os.environ)
    env.update(
        SPARK_LOCAL_IP="127.0.0.1",
        SPARK_MASTER_HOST="127.0.0.1",
        SPARK_NO_DAEMONIZE="1",
    )
    env.update(env_extra or {})
    cmd = []
    if cpus:
        cmd += ["taskset", "-c", cpus]
    cmd += [os.path.join(SPARK_HOME, "bin", "spark-class"), *args]
    return subprocess.Popen(
        cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )


def _wait_port(port: int, timeout: float = 30.0) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return True
        time.sleep(0.3)
    return False


class StandaloneCluster:
    """Context manager: master + `n_workers` workers, worker i pinned to CPU i."""

    def __init__(self, n_workers: int, worker_mem: str = "6g", work_dir: str = "/tmp/spark-standalone"):
        self.n_workers = n_workers
        self.worker_mem = worker_mem
        self.work_dir = work_dir
        self.procs: list[subprocess.Popen] = []

    def __enter__(self):
        os.makedirs(self.work_dir, exist_ok=True)
        self.procs.append(
            _spark_class(
                "org.apache.spark.deploy.master.Master",
                "--host", "127.0.0.1", "--port", str(MASTER_PORT), "--webui-port", "0",
            )
        )
        if not _wait_port(MASTER_PORT):
            raise RuntimeError("standalone master did not come up")
        for i in range(self.n_workers):
            self.procs.append(
                _spark_class(
                    "org.apache.spark.deploy.worker.Worker",
                    f"spark://127.0.0.1:{MASTER_PORT}",
                    "--cores", "1",
                    "--memory", self.worker_mem,
                    "--work-dir", os.path.join(self.work_dir, f"w{i}"),
                    "--webui-port", "0",
                    cpus=str(i),
                )
            )
        time.sleep(3)  # worker registration
        return self

    @property
    def master_url(self) -> str:
        return f"spark://127.0.0.1:{MASTER_PORT}"

    def __exit__(self, *exc):
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        return False
