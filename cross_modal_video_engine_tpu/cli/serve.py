"""Engine HTTP server CLI.

Wires the four capability handlers to the service layer (the live backend
the reference's static web demo never had — Video-engine-web serves
hard-coded results, SURVEY §0).  Capabilities are enabled by the
checkpoints you pass; missing ones 404.

  python -m cross_modal_video_engine_tpu.cli.serve \
      --retrieval_checkpoint CKPT --rootpath R --collection C \
      --visual_feature F [--port 8765]
"""

from __future__ import annotations

import argparse

from ..service.app import EngineService, create_server


def build_retrieval_handler(args):
    import jax
    import numpy as np
    from .common import load_dataset, restore_dual_encoding
    from .retrieval_inference import build_video_index, embed_query

    model, state = restore_dual_encoding(args.retrieval_checkpoint)
    dataset = load_dataset(args.rootpath, args.collection,
                           args.visual_feature)
    index = build_video_index(model, state["variables"], dataset,
                              cache=args.index_cache)

    def handler(payload: dict) -> dict:
        q = embed_query(model, state["variables"], dataset, payload["query"])
        scores, ids = index.search_ids(q, int(payload.get("topK", 10)))
        return {"results": [
            {"video": v, "score": float(s)}
            for v, s in zip(ids[0], scores[0])]}

    return handler


def build_caption_handler(args):
    import numpy as np
    from ..models.decoder_head import RNNDecoderConfig
    from ..models.recognizer import Recognizer3DRelseq
    from ..models.timesformer import TimeSformerConfig
    from ..train.checkpoint import load_checkpoint
    from .caption_inference import caption_video

    variables, cfg_d, _ = load_checkpoint(args.caption_checkpoint)
    ts = TimeSformerConfig(**{k: tuple(v) if isinstance(v, list) else v
                              for k, v in cfg_d["backbone"].items()})
    model = Recognizer3DRelseq(ts, RNNDecoderConfig(**cfg_d["decoder"]))

    def handler(payload: dict) -> dict:
        steps, probs = caption_video(model, variables, payload["video"])
        return {"steps": [[int(i) for i in s] for s in steps]}

    return handler


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--retrieval_checkpoint")
    parser.add_argument("--rootpath")
    parser.add_argument("--collection")
    parser.add_argument("--visual_feature")
    parser.add_argument("--index_cache", default=None)
    parser.add_argument("--caption_checkpoint")
    args = parser.parse_args(argv)

    service = EngineService()
    if args.retrieval_checkpoint:
        service.register("retrieval", build_retrieval_handler(args))
    if args.caption_checkpoint:
        service.register("caption", build_caption_handler(args))

    server = create_server(service, args.host, args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"routes={sorted(service.handlers)}")
    server.serve_forever()


if __name__ == "__main__":
    main()
