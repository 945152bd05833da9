import time


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def start(self):
        self.t0 = time.perf_counter()
        return self

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def elapsed_string(self) -> str:
        s = self.elapsed()
        h, rem = divmod(s, 3600)
        m, sec = divmod(rem, 60)
        if h >= 1:
            return f"{int(h):02d}h{int(m):02d}m{sec:06.3f}s"
        if m >= 1:
            return f"{int(m):02d}m{sec:06.3f}s"
        return f"{sec:.3f}s"
