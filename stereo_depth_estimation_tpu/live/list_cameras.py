"""``foundation-stereo-list-cameras``: probe camera indices (reference
list_cameras.py parity)."""

from __future__ import annotations

import argparse


def probe_cameras(max_index: int) -> list[tuple[int, int, int]]:
    import cv2

    found: list[tuple[int, int, int]] = []
    for idx in range(max_index + 1):
        cap = cv2.VideoCapture(idx)
        ok, frame = cap.read()
        if ok and frame is not None:
            h, w = frame.shape[:2]
            found.append((idx, w, h))
            print(f"  index={idx}: OK ({w}x{h})")
        cap.release()
    return found


def main() -> None:
    parser = argparse.ArgumentParser(description="Probe camera indices.")
    parser.add_argument(
        "--max-index", type=int, default=10, help="Largest index to test."
    )
    args = parser.parse_args()

    print("Detecting cameras...")
    found = probe_cameras(args.max_index)
    if not found:
        print("No cameras found.")
        return
    print("\nUse two indices (left/right) for calibration and the live viewers.")
    print("Found Cameras: ")
    for idx, w, h in found:
        print(f"  index={idx}: {w}x{h}")


if __name__ == "__main__":
    main()
