"""Task definitions importable by process-worker children (spawn
re-imports this module by name in the child, so tasks must live in a
real module, not a test function body)."""
import os
import time

from vtd_tpu.serve.queue import TaskQueue

registry_queue = TaskQueue()


@registry_queue.task(name="add")
def add(self, a, b):
    return a + b


@registry_queue.task(name="sleepy")
def sleepy(self, seconds):
    """Cooperative task: polls is_revoked (soft-limit / revoke path)."""
    t0 = time.time()
    while time.time() - t0 < seconds:
        time.sleep(0.05)
        if self.is_revoked():
            raise InterruptedError("cancelled")
    return "done"


@registry_queue.task(name="hang")
def hang(self, seconds):
    """Uncooperative task: never polls is_revoked (hard-limit path)."""
    time.sleep(seconds)
    return "finished"


@registry_queue.task(name="whoami")
def whoami(self):
    return os.getpid()


@registry_queue.task(name="crash")
def crash(self):
    os._exit(9)
