"""Deterministic seed corpora for model building and fixture generation.

Small per-language vocabularies used to (a) train the tiny char-n-gram
langid profiles and the n-gram perplexity LM at import time, and (b)
generate the synthetic transcripts fixture. Everything here is a pure
function of the embedded constants + an explicit seed, so the pandas
oracle and the Spark pipeline see byte-identical inputs and models.
"""

from __future__ import annotations

import random

# ~60 common words per language. Chosen for distinctive char-trigram
# signatures (accents/ligatures help the classifier).
WORDS: dict[str, list[str]] = {
    "en": (
        "the be to of and a in that have it for not on with he as you do at "
        "this but his by from they we say her she or an will my one all would "
        "there their what so up out if about who get which go me when make can "
        "like time just him know take people into year your good some could "
        "them see other than then now look only come its over think also back "
        "after use two how our work first well way even new want because any "
        "these give day most us system data query table"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui ce dans en du elle "
        "au pour pas vous par sur faire plus dire me on mon lui nous comme "
        "mais pouvoir avec tout y aller voir bien où sans tu ou leur homme si "
        "deux mari moi vouloir te femme venir quand grand celui même notre "
        "autre après jour très chose donner bon maintenant système données "
        "requête tableau français toujours depuis chaque nouvelle déjà être"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei "
        "einer um am sind noch wie einem über einen so zum war haben nur oder "
        "aber vor zur bis mehr durch man sein wurde sei schön größe straße "
        "zeit jahr können müssen deutschland sprache daten abfrage tabelle "
        "immer schon wieder zwischen während natürlich vielleicht"
    ).split(),
    "es": (
        "el la de que y a en un ser se no haber por con su para como estar "
        "tener le lo todo pero más hacer o poder decir este ir otro ese si me "
        "ya ver porque dar cuando él muy sin vez mucho saber qué sobre mi "
        "alguno mismo yo también hasta año dos querer entre así primero desde "
        "grande eso ni nos llegar pasar tiempo ella sí día uno bien poco deber "
        "entonces poner cosa tanto hombre parecer nuestro tan donde ahora "
        "después vida quedar siempre sistema datos consulta tabla español"
    ).split(),
}

LANGS = sorted(WORDS)

# English stopwords for the Gopher-style stopword-density rule.
EN_STOPWORDS = frozenset(
    "the be to of and a in that have it for not on with as you do at this "
    "but his by from they we say her she or an will my one all would there "
    "their is are was were been has had".split()
)


def make_sentence(rng: random.Random, lang: str, n_words: int) -> str:
    """One deterministic pseudo-sentence in `lang`."""
    words = WORDS[lang]
    toks = [rng.choice(words) for _ in range(n_words)]
    toks[0] = toks[0].capitalize()
    return " ".join(toks) + "."


def make_text(rng: random.Random, lang: str, n_sentences: int,
              words_per_sentence: tuple[int, int] = (5, 14)) -> str:
    lo, hi = words_per_sentence
    return " ".join(
        make_sentence(rng, lang, rng.randint(lo, hi)) for _ in range(n_sentences)
    )


def training_corpus(lang: str, n_sentences: int = 400, seed: int = 1234) -> str:
    """Deterministic training text for the langid / LM models.

    Uses a seed disjoint from the fixture seed (42) so models aren't
    trained on the literal test strings, only the shared vocabulary.
    """
    rng = random.Random((seed, lang).__repr__())
    return make_text(rng, lang, n_sentences)
