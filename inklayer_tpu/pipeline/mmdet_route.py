"""Alternative detector route with the mmdetection output contract.

Parity target: InkLayer/detector/gdino_mmdetection.py
run_ft_dino_inference_on_image (:25-117) — the reference's optional
`DetInferencer` path: multi-noun text prompts ("a . b . c"), per-box label =
matched noun, normalized-xyxy JSON written to `mmdet_out/<name>.json`, which
the bbox filter prefers over `bboxes.json` when present
(refinement/bbox_filter.py:40-45; mirrored in pipeline/runner.py).

TPU-native: instead of an mmdet `DetInferencer` (mmdet is not vendored in
the reference either), the same fine-tuned GroundingDINO runs through this
framework's GDinoDetector; per-box labels come from the token posmap decoded
against the prompt, then matched back to the noun list (the reference's
label_idx -> nouns[i] mapping, :91-96).
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

DEF_SCORE_THRESHOLD = 0.2


def _match_noun(phrase: str, nouns: Sequence[str]) -> str:
    """Map a decoded posmap phrase back to the prompt noun it came from
    (mmdet's label_idx -> nouns[idx]; 'unknown' when nothing matches,
    gdino_mmdetection.py:91-96)."""
    phrase = phrase.lower().strip()
    if not phrase:
        return "unknown"
    best, best_score = "unknown", 0
    for noun in nouns:
        nl = noun.lower().strip()
        if not nl:
            continue
        if nl == phrase:
            return noun
        # token-overlap score: handles posmaps that span several prompt words
        overlap = len(set(nl.split()) & set(phrase.split()))
        if nl in phrase or phrase in nl:
            overlap = max(overlap, 1)
        if overlap > best_score:
            best, best_score = noun, overlap
    return best


def run_ft_dino_inference_on_image(
    detector,
    image_path: str,
    nouns: Sequence[str],
    mmdet_out_base_dir: str,
    out_dir: Optional[str] = None,
    score_threshold: float = DEF_SCORE_THRESHOLD,
) -> dict:
    """Run the alt detector route and write the mmdet-contract outputs.

    detector: a GDinoDetector.  Writes `<name>.json` (normalized xyxy bboxes
    + noun labels + scores + model_info), `input_image.png`, `pred.png` into
    `out_dir` (defaults to mmdet_out_base_dir), matching
    gdino_mmdetection.py:82-117.
    """
    out_dir = out_dir or mmdet_out_base_dir
    image_pil = Image.open(image_path).convert("RGB")
    image = np.asarray(image_pil)
    img_w, img_h = image_pil.size
    image_name = os.path.basename(image_path).split(".")[0]

    prompt = " . ".join(nouns)
    det = detector.detect(image, caption=prompt,
                          box_threshold=score_threshold)

    out_dict: dict = {"bboxes": [], "labels": [], "scores": []}
    boxes_norm_xyxy: List[List[float]] = []
    for box, score, label in zip(det["boxes"], det["scores"],
                                 det.get("labels", [])):
        cx, cy, bw, bh = [float(v) for v in box]
        xyxy = [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2]
        out_dict["bboxes"].append(xyxy)
        out_dict["labels"].append(_match_noun(label, nouns))
        out_dict["scores"].append(float(score))
        boxes_norm_xyxy.append(xyxy)

    os.makedirs(out_dir, exist_ok=True)
    image_pil.save(os.path.join(out_dir, "input_image.png"))
    from inklayer_tpu.io.outputs import draw_boxes_image

    draw_boxes_image(image_pil, boxes_norm_xyxy, out_dict["scores"],
                     labels=out_dict["labels"]).save(
        os.path.join(out_dir, "pred.png"))

    out_dict["model_info"] = {
        "model_config": "inklayer_tpu.GDinoConfig",
        "weights": "inklayer_gdino (converted)",
        "device": "tpu",
        "score_threshold": score_threshold,
        "time": datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
    }
    json_path = os.path.join(out_dir, f"{image_name}.json")
    with open(json_path, "w") as f:
        json.dump(out_dict, f, indent=4)
    return out_dict


def main(argv=None):
    """CLI mirror of the reference script's usage: writes mmdet_out/ for an
    image so the pipeline's bbox filter prefers it on the next run."""
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--img", required=True)
    ap.add_argument("--nouns", nargs="+", default=["object"])
    ap.add_argument("--out_dir", default=None,
                    help="defaults to <img_dir>/mmdet_out")
    ap.add_argument("--score_threshold", type=float,
                    default=DEF_SCORE_THRESHOLD)
    ap.add_argument("--models_dir", default=None)
    args = ap.parse_args(argv)

    from inklayer_tpu.build import build_detector

    detector = build_detector(models_dir=args.models_dir)
    out_dir = args.out_dir or os.path.join(
        os.path.dirname(os.path.abspath(args.img)), "mmdet_out")
    run_ft_dino_inference_on_image(
        detector, args.img, list(args.nouns), out_dir,
        score_threshold=args.score_threshold)


if __name__ == "__main__":  # pragma: no cover
    main()
