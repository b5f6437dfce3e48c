"""StatePrefetcher: lookahead init_state overlaps, maps, and degrades.

The production property (next video's encode hides behind the current
video's propagation — reference serializes these,
generate_tokens_grid.py:142-237) is asserted with a fake predictor that
records call threads and timings.
"""

import threading
import time

from sola_tpu.trackgen.prefetch import StatePrefetcher


class FakePredictor:
    def __init__(self, encode_s: float = 0.0):
        self.encode_s = encode_s
        self.calls = []  # (video_path, thread_name, t_start)
        self.lock = threading.Lock()

    def init_state(self, frames, video_path=None):
        t0 = time.monotonic()
        with self.lock:
            self.calls.append((video_path,
                               threading.current_thread().name, t0))
        if self.encode_s:
            time.sleep(self.encode_s)
        return f"state:{video_path}"


def test_states_map_to_their_videos():
    pred = FakePredictor()
    with StatePrefetcher(pred) as pf:
        pf.schedule("a", "/frames/a")
        pf.schedule("b", "/frames/b")
        assert pf.get("a", "/frames/a") == "state:/frames/a"
        assert pf.get("b", "/frames/b") == "state:/frames/b"
        # unscheduled key encodes inline, identical result
        assert pf.get("c", "/frames/c") == "state:/frames/c"
    assert [c[0] for c in pred.calls] == ["/frames/a", "/frames/b",
                                          "/frames/c"]


def test_schedule_is_idempotent():
    pred = FakePredictor()
    with StatePrefetcher(pred) as pf:
        for _ in range(3):
            pf.schedule("a", "/frames/a")
        pf.get("a", "/frames/a")
    assert len(pred.calls) == 1


def test_next_video_encodes_during_current_processing():
    pred = FakePredictor(encode_s=0.05)
    with StatePrefetcher(pred) as pf:
        pf.schedule("a", "/frames/a")
        pf.schedule("b", "/frames/b")
        pf.get("a", "/frames/a")
        t_processing_start = time.monotonic()
        time.sleep(0.15)  # "propagation" of video a
        t_got_b = time.monotonic()
        pf.get("b", "/frames/b")
        # b's encode finished inside a's processing window: get() returns
        # without paying encode latency again
        assert time.monotonic() - t_got_b < 0.04
    b_start = pred.calls[1][2]
    assert b_start < t_processing_start + 0.15  # overlapped, not after
    assert pred.calls[1][1].startswith("sola-prefetch")


def test_disabled_runs_inline_on_caller_thread():
    pred = FakePredictor()
    pf = StatePrefetcher(pred, enabled=False)
    pf.schedule("a", "/frames/a")  # no-op
    assert pf.get("a", "/frames/a") == "state:/frames/a"
    assert len(pred.calls) == 1
    assert pred.calls[0][1] == threading.current_thread().name
    pf.close()
