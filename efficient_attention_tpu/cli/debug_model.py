"""Model debug harness — ``vit/debug.py`` equivalent.

One forward pass with: NaN check (named first-offending module), analytic
FLOPs via XLA cost analysis (fvcore ``flop_count`` analogue), a profiler
trace, and timed throughput.
"""
from __future__ import annotations

import json


def cli_main(argv=None):
    from efficient_attention_tpu.cli.train_vit import parse_args

    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from efficient_attention_tpu.config import namespace_to_dict
    from efficient_attention_tpu.models import create_model
    from efficient_attention_tpu.utils import (
        NanDetector,
        flop_count,
        timed_throughput,
    )
    import argparse as _ap

    attn_args = namespace_to_dict(
        getattr(args, "attn_specific_args", _ap.Namespace()))
    kwargs = dict(attn_name=args.attn_name, attn_args=attn_args,
                  img_size=args.input_size, num_classes=args.num_classes)
    if not args.model.startswith("pvt") and getattr(args, "depth", None):
        kwargs["depth"] = args.depth
    model = create_model(args.model, **kwargs)
    x = jnp.ones((args.batch_size, args.input_size, args.input_size, 3))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1],
                                        deterministic=True))()

    fwd = lambda p, xx: model.apply(p, xx, deterministic=True)  # noqa: E731
    out = jax.jit(fwd)(params, x)
    print("output:", out.shape, "all-nan:", bool(jnp.isnan(out).all()))

    det = NanDetector()
    with det.intercept():
        model.apply(params, x[:1], deterministic=True)
    print("first non-finite module:", det.first_bad or "none")

    flops = flop_count(fwd, params, x)
    if flops:
        print(f"flops/forward: {flops:.3e} ({flops / x.shape[0]:.3e} per image)")

    ips = timed_throughput(fwd, params, x, iters=10,
                           items_per_call=x.shape[0])
    print(json.dumps({"images_per_sec": round(ips, 2),
                      "flops": flops, "batch": int(x.shape[0])}))


if __name__ == "__main__":
    cli_main()
