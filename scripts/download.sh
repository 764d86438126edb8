#!/usr/bin/env bash
# Artifact download script — the reference's scripts/download.sh equivalent.
# Fetches the model weights every style config expects under ./models/.
# (This build environment is air-gapped; run this wherever you deploy.)
set -euo pipefail

MODELS_DIR="${1:-./models}"
mkdir -p "$MODELS_DIR" "$MODELS_DIR/styles" "$MODELS_DIR/loras"

echo ">> SD-1.5 base (HF diffusers layout: unet/vae/text_encoder/tokenizer)"
if command -v huggingface-cli >/dev/null; then
  huggingface-cli download runwayml/stable-diffusion-v1-5 \
    --local-dir "$MODELS_DIR/stable-diffusion-v1-5" \
    --include "unet/*" "vae/*" "text_encoder/*" "tokenizer/*" "*.json"
else
  echo "   install huggingface_hub or fetch runwayml/stable-diffusion-v1-5 manually"
fi

echo ">> Live2Diff motion module"
curl -L -o "$MODELS_DIR/live2diff.ckpt" \
  "https://huggingface.co/Leoxing/Live2Diff/resolve/main/live2diff.ckpt"

echo ">> MiDaS DPT-hybrid depth model"
curl -L -o "$MODELS_DIR/dpt_hybrid_384.pt" \
  "https://github.com/isl-org/MiDaS/releases/download/v3/dpt_hybrid_384.pt"

echo ">> TAESD tiny VAE"
curl -L -o "$MODELS_DIR/taesd.safetensors" \
  "https://huggingface.co/madebyollin/taesd/resolve/main/diffusion_pytorch_model.safetensors"

echo ">> LCM-LoRA (SD-1.5)"
curl -L -o "$MODELS_DIR/loras/lcm-lora-sdv1-5.safetensors" \
  "https://huggingface.co/latent-consistency/lcm-lora-sdv1-5/resolve/main/pytorch_lora_weights.safetensors"

# Style checkpoints (civitai) — same artifacts the reference styles use.
# civitai requires an API token for some files: export CIVITAI_TOKEN=...
civitai() { # id, outfile
  curl -L ${CIVITAI_TOKEN:+-H "Authorization: Bearer $CIVITAI_TOKEN"} \
    -o "$2" "https://civitai.com/api/download/models/$1"
}
echo ">> style DreamBooth checkpoints + LoRAs"
civitai 69832  "$MODELS_DIR/styles/disneyPixarCartoon_v10.safetensors"
civitai 107289 "$MODELS_DIR/styles/toonyou_beta6.safetensors"
civitai 36644  "$MODELS_DIR/styles/3Guofeng3_v34.safetensors"
civitai 105924 "$MODELS_DIR/styles/aziibpixelmix_v10.safetensors"
civitai 132632 "$MODELS_DIR/styles/helloartdoor_V122p.safetensors"
civitai 425083 "$MODELS_DIR/styles/revAnimated_v2RebirthVAE.safetensors"
civitai 14856  "$MODELS_DIR/loras/MoXinV1.safetensors"
civitai 266928 "$MODELS_DIR/loras/ral-origami-sd15.safetensors"
civitai 171068 "$MODELS_DIR/loras/kFeltedReV.safetensors"

echo "done. Point configs/base.yaml at $MODELS_DIR."
