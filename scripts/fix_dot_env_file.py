"""Interactively create or complete the repository's .env file.

Rebuild of the reference's bootstrap script (reference:
``src/scripts/fix_dot_env_file.py:13-35``): prompts for any missing secrets and
appends them to ``.env``::

    python scripts/fix_dot_env_file.py
"""

from pathlib import Path

DESIRED_ENVIRONMENT_VARIABLES = {
    "HUGGINGFACE_HUB_TOKEN": "Hugging Face Hub access token (hf_...): ",
    "WANDB_API_KEY": "Weights & Biases API key (blank to skip): ",
}


def main() -> None:
    env_path = Path(".env")
    existing: dict[str, str] = {}
    if env_path.exists():
        for line in env_path.read_text(encoding="utf-8").splitlines():
            key, _, value = line.partition("=")
            if key.strip():
                existing[key.strip()] = value.strip()

    lines = []
    for key, prompt in DESIRED_ENVIRONMENT_VARIABLES.items():
        if existing.get(key):
            continue
        value = input(prompt).strip()
        if value:
            lines.append(f'{key}="{value}"')

    if lines:
        with env_path.open("a", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        print(f"Added {len(lines)} entries to {env_path}.")
    else:
        print("Nothing to add; .env is complete.")


if __name__ == "__main__":
    main()
