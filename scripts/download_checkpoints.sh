#!/usr/bin/env bash
# Fetch the public checkpoints this framework can convert (io/weights.py).
# Mirrors the reference's models/download_ckpts.sh manifest plus the
# diffusion weights its pipeline pulls implicitly from the HF hub.
set -euo pipefail
DEST="${1:-./models}"
mkdir -p "$DEST"

echo "SAM ViT-H ..."
wget -nc -P "$DEST" https://dl.fbaipublicfiles.com/segment_anything/sam_vit_h_4b8939.pth

echo "Depth-Anything-V2 ViT-B ..."
wget -nc -O "$DEST/depth_anything_v2_vitb.pth" \
  "https://huggingface.co/depth-anything/Depth-Anything-V2-Base/resolve/main/depth_anything_v2_vitb.pth"

echo "InkLayer fine-tuned GroundingDINO ..."
wget -nc -O "$DEST/inklayer_gdino.pth" \
  "https://huggingface.co/miatang13/InkLayer/resolve/main/inklayer_gdino.pth"

echo "Tokenizer data (exact ids for arbitrary captions/prompts) ..."
mkdir -p "$DEST/bert-base-uncased" "$DEST/clip-vit-large-patch14"
wget -nc -O "$DEST/bert-base-uncased/vocab.txt" \
  "https://huggingface.co/google-bert/bert-base-uncased/resolve/main/vocab.txt"
wget -nc -O "$DEST/clip-vit-large-patch14/vocab.json" \
  "https://huggingface.co/openai/clip-vit-large-patch14/resolve/main/vocab.json"
wget -nc -O "$DEST/clip-vit-large-patch14/merges.txt" \
  "https://huggingface.co/openai/clip-vit-large-patch14/resolve/main/merges.txt"

echo "SD1.5-inpaint UNet/VAE/text + ControlNet v11p (diffusers layout) ..."
echo "  (use huggingface-cli: runwayml/stable-diffusion-inpainting ->" \
     "\$DEST/stable-diffusion-inpainting, lllyasviel/control_v11p_sd15_inpaint" \
     "-> \$DEST/control_v11p_sd15_inpaint; see" \
     "inklayer_tpu/build.py resolve_diffusion_checkpoints for the layout)"
