"""Gradio launcher (reference run_gradio.py)."""

import argparse


def main():
    p = argparse.ArgumentParser(description="Run gradio interface")
    p.add_argument("--model-config", type=str, default=None)
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--pretrained-name", type=str, default=None)
    p.add_argument("--model-half", action="store_true")
    p.add_argument("--listen", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()

    from stable_audio_tools_tpu.interface.gradio import create_ui

    ui = create_ui(
        model_config_path=args.model_config,
        ckpt_path=args.ckpt_path,
        pretrained_name=args.pretrained_name,
        model_half=args.model_half,
    )
    ui.launch(server_name="0.0.0.0" if args.listen else None,
              server_port=args.port, share=False)


if __name__ == "__main__":
    main()
