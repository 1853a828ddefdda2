"""GUI annotation + dataset viewer (tkinter).

Parity with ``schaaaafrichter/generation/annotate_background.py`` (click-
drag bbox annotation over background photos, emitting the annotations
JSON consumed by ``dataset_tools generate_scenes``) and
``generation/viewer.py`` (browse a gt JSON with drawn boxes).

Usage:
  python -m loans_tpu.cli.annotate annotate "backgrounds/*.jpg" out.json
  python -m loans_tpu.cli.annotate view gt.json

Keys (both modes): n/right = next image, p/left = previous, q = quit.
Annotate mode: drag to draw a box, u = undo last box, s = save.
"""

from __future__ import annotations

import argparse
import glob
import json
import os


class Annotator:
    def __init__(self, images: list[str], out_path: str):
        import tkinter as tk

        from PIL import Image, ImageTk

        self.tk = tk
        self.ImageTk = ImageTk
        self.ImageMod = Image
        self.images = images
        self.out_path = out_path
        self.index = 0
        self.records = {
            os.path.abspath(e["image"]): e.get("bounding_boxes", [])
            for e in (
                json.load(open(out_path)) if os.path.exists(out_path) else []
            )
        }
        self.root = tk.Tk()
        self.root.title("annotate backgrounds")
        self.canvas = tk.Canvas(self.root)
        self.canvas.pack(fill="both", expand=True)
        self.canvas.bind("<ButtonPress-1>", self.on_press)
        self.canvas.bind("<B1-Motion>", self.on_drag)
        self.canvas.bind("<ButtonRelease-1>", self.on_release)
        for key, fn in (
            ("n", self.next), ("<Right>", self.next),
            ("p", self.prev), ("<Left>", self.prev),
            ("u", self.undo), ("s", self.save), ("q", self.quit),
        ):
            self.root.bind(key, fn)
        self._drag = None
        self.show()

    # -- navigation -------------------------------------------------------
    def show(self):
        path = self.images[self.index]
        self.img = self.ImageMod.open(path).convert("RGB")
        self.photo = self.ImageTk.PhotoImage(self.img)
        self.canvas.config(width=self.img.width, height=self.img.height)
        self.redraw()
        self.root.title(
            f"[{self.index + 1}/{len(self.images)}] {os.path.basename(path)}"
        )

    def redraw(self):
        self.canvas.delete("all")
        self.canvas.create_image(0, 0, anchor="nw", image=self.photo)
        for y1, x1, y2, x2 in self.boxes():
            self.canvas.create_rectangle(
                x1, y1, x2, y2, outline="red", width=2
            )

    def boxes(self):
        return self.records.setdefault(
            os.path.abspath(self.images[self.index]), []
        )

    def next(self, *_):
        self.index = (self.index + 1) % len(self.images)
        self.show()

    def prev(self, *_):
        self.index = (self.index - 1) % len(self.images)
        self.show()

    # -- drawing ----------------------------------------------------------
    def on_press(self, ev):
        self._drag = (ev.x, ev.y)

    def on_drag(self, ev):
        if self._drag:
            self.redraw()
            self.canvas.create_rectangle(
                self._drag[0], self._drag[1], ev.x, ev.y,
                outline="yellow", width=2,
            )

    def on_release(self, ev):
        if self._drag:
            x1, y1 = self._drag
            self._drag = None
            box = [
                float(min(y1, ev.y)), float(min(x1, ev.x)),
                float(max(y1, ev.y)), float(max(x1, ev.x)),
            ]
            if box[2] - box[0] > 2 and box[3] - box[1] > 2:
                self.boxes().append(box)
            self.redraw()

    def undo(self, *_):
        if self.boxes():
            self.boxes().pop()
            self.redraw()

    def save(self, *_):
        records = [
            {"image": path, "bounding_boxes": boxes}
            for path, boxes in self.records.items()
            if boxes
        ]
        with open(self.out_path, "w") as f:
            json.dump(records, f, indent=2)
        print(f"saved {len(records)} annotated images -> {self.out_path}")

    def quit(self, *_):
        self.save()
        self.root.destroy()

    def run(self):
        self.root.mainloop()


def view(gt_path: str):
    import tkinter as tk

    from PIL import Image, ImageDraw, ImageTk

    entries = json.load(open(gt_path))
    root_dir = os.path.dirname(os.path.abspath(gt_path))
    idx = [0]
    root = tk.Tk()
    label = tk.Label(root)
    label.pack()

    def show():
        e = entries[idx[0]]
        p = e["image"]
        p = p if os.path.isabs(p) else os.path.join(root_dir, p)
        img = Image.open(p).convert("RGB")
        draw = ImageDraw.Draw(img)
        for y1, x1, y2, x2 in e.get("bounding_boxes", []):
            draw.rectangle([x1, y1, x2, y2], outline=(255, 0, 0), width=2)
        photo = ImageTk.PhotoImage(img)
        label.configure(image=photo)
        label.image = photo
        root.title(f"[{idx[0] + 1}/{len(entries)}] {os.path.basename(p)}")

    def move(d):
        idx[0] = (idx[0] + d) % len(entries)
        show()

    root.bind("n", lambda e: move(1))
    root.bind("<Right>", lambda e: move(1))
    root.bind("p", lambda e: move(-1))
    root.bind("<Left>", lambda e: move(-1))
    root.bind("q", lambda e: root.destroy())
    show()
    root.mainloop()


def main(argv=None):
    p = argparse.ArgumentParser(description="annotation / viewing tools")
    sub = p.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("annotate")
    a.add_argument("images", help="glob of background images")
    a.add_argument("output", help="annotations json")
    v = sub.add_parser("view")
    v.add_argument("gt", help="gt json to browse")
    args = p.parse_args(argv)
    if args.cmd == "annotate":
        images = sorted(glob.glob(args.images))
        if not images:
            raise SystemExit(f"no images match {args.images!r}")
        Annotator(images, args.output).run()
    else:
        view(args.gt)


if __name__ == "__main__":
    main()
