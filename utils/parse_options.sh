# Kaldi-style option parsing for recipe scripts: --name value pairs set
# shell variables of the same name.
while true; do
  case "${1:-}" in
    --*) name=$(echo "$1" | sed s/^--// | sed s/-/_/g)
         eval "$name=\"${2:-}\""
         shift 2 ;;
    *) break ;;
  esac
done
true
