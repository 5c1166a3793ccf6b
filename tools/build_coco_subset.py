"""Build the COCO-in-VidVRD detector pre-training subset.

Counterpart of reference datasets/mega/extract_coco.py: select the COCO
categories that overlap VidVRD's 35 entity classes (plus the synonym
renames cattle->cow, sofa->couch, ball->sports ball, domestic_cat->cat,
watercraft->boat), keep only images containing those classes, remap
category ids to VidVRD entity ids, and write a filtered COCO-format JSON
(no pycocotools needed — plain JSON surgery) that tools/train_detector.py
style loaders can consume.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

from vrdone_tpu.data.category import VIDVRD_ENTITIES, \
    vidvrd_category_name_to_id

# COCO names that are spelled differently in VidVRD
SYNONYMS_VIDVRD_TO_COCO = {
    "cattle": "cow",
    "sofa": "couch",
    "ball": "sports ball",
    "domestic_cat": "cat",
    "watercraft": "boat",
}


def selected_classes(coco_categories: set[str]) -> dict[str, str]:
    """{vidvrd_name: coco_name} for the overlapping classes."""
    out = {}
    for name in VIDVRD_ENTITIES[1:]:
        if name in coco_categories:
            out[name] = name
        elif name in SYNONYMS_VIDVRD_TO_COCO and \
                SYNONYMS_VIDVRD_TO_COCO[name] in coco_categories:
            out[name] = SYNONYMS_VIDVRD_TO_COCO[name]
    return out


def build_subset(coco_json: dict) -> dict:
    """Filter a COCO instances dict to the VidVRD-overlap classes with
    VidVRD entity ids. Returns a COCO-format dict."""
    coco_names = {c["name"] for c in coco_json["categories"]}
    mapping = selected_classes(coco_names)
    coco_name_to_id = {c["name"]: c["id"] for c in coco_json["categories"]}
    cocoid_to_vid = {coco_name_to_id[cn]: vidvrd_category_name_to_id[vn]
                     for vn, cn in mapping.items()}

    anns = [dict(a, category_id=cocoid_to_vid[a["category_id"]])
            for a in coco_json["annotations"]
            if a["category_id"] in cocoid_to_vid and not a.get("iscrowd", 0)]
    img_ids = {a["image_id"] for a in anns}
    images = [im for im in coco_json["images"] if im["id"] in img_ids]
    categories = [{"id": vidvrd_category_name_to_id[vn], "name": vn}
                  for vn in sorted(mapping)]
    return {"images": images, "annotations": anns,
            "categories": categories}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coco_ann", required=True,
                   help="instances_train2014.json etc.")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    with open(args.coco_ann) as f:
        coco = json.load(f)
    sub = build_subset(coco)
    with open(args.out, "w") as f:
        json.dump(sub, f)
    print(f"{len(sub['categories'])} classes, {len(sub['images'])} images, "
          f"{len(sub['annotations'])} annotations -> {args.out}")


if __name__ == "__main__":
    main()
