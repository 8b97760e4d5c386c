"""Trace analyzer (tools/analyze_trace.py): parses a real jax.profiler
Chrome trace produced in-process and prints lane/op summaries."""

import jax
import jax.numpy as jnp

from diffusiondepth_tpu.tools.analyze_trace import (
    find_trace_file,
    load_device_events,
    main,
    summarize,
)


def _make_trace(tmp_path):
    @jax.jit
    def f(x):
        return jnp.tanh(x @ x).sum()

    x = jnp.ones((128, 128), jnp.float32)
    f(x).block_until_ready()  # compile outside the trace window
    with jax.profiler.trace(str(tmp_path)):
        f(x).block_until_ready()
    return find_trace_file(str(tmp_path))


def test_summarize_real_trace(tmp_path, capsys):
    tf = _make_trace(tmp_path)
    assert tf.endswith(".trace.json.gz")
    device, lanes = load_device_events(tf)
    assert lanes, "no events parsed"
    text = summarize(tf)
    assert "trace:" in text and "ms" in text
    # CLI prints the same summary
    main([str(tmp_path), "--top", "5"])
    assert "ms" in capsys.readouterr().out
