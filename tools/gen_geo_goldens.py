#!/usr/bin/env python3
"""Differential goldens for the Taiwan-address cleaner (X24).

Reimplements the semantics of the reference's Geocoder._clean_address
(/root/reference/core/enrichment/geocoder.py:45-94) with stdlib `re` only,
runs it over a fixture set covering every branch, and dumps
(input TAB expected) rows for GeoSpec to assert byte parity against the
Scala Column pipeline. Run: python3 tools/gen_geo_goldens.py
"""
import re

CITIES = ["台北市", "新北市", "桃園市", "台中市", "台南市", "高雄市",
          "基隆市", "新竹市", "嘉義市", "新竹縣", "苗栗縣", "彰化縣",
          "南投縣", "雲林縣", "嘉義縣", "屏東縣", "宜蘭縣", "花蓮縣",
          "台東縣", "澎湖縣", "金門縣", "連江縣"]


def clean_address(address: str) -> str:
    if not address:
        return ""
    trans_map = str.maketrans(
        '１２３４５６７８９０（）［］／、﹝﹞【】',
        '1234567890()[]/,()[]')
    address = address.translate(trans_map)

    parts = re.split(r'[/,、]', address)
    if len(parts) > 1:
        address = parts[0].strip()

    address = re.sub(r'^(台灣|中華民國|臺灣|Taiwan|R\.O\.C|台灣省|臺灣省)', '', address).strip()
    address = address.lstrip(',， ')

    address = re.sub(r'[\(\[].*?[\)\]]', '', address).strip()

    patterns = [
        r'\d+[樓Ff].*',
        r'B\d+.*',
        r'地下\d+樓.*',
        r'[第]?[A-Z0-9]+[室室].*',
        r'\d+棟.*',
        r'(?<=號)\s*[A-Z0-9].*',
    ]
    for p in patterns:
        address = re.sub(p, '', address).strip()

    for city in CITIES:
        if address.startswith(city + city):
            address = address.replace(city + city, city, 1)

    address = address.rstrip('- ').strip()
    return address


FIXTURES = [
    # plain
    "台北市信義區信義路五段7號",
    # fullwidth digits and brackets
    "台北市信義區信義路五段７號（近101）",
    "新北市板橋區文化路二段１００號［大樓］",
    # multiple addresses -> first
    "台北市中山區南京東路一段12號/新北市板橋區文化路100號",
    "高雄市前鎮區中山二路2號、台南市東區大學路1號",
    "台中市西屯區台灣大道三段99號，逗號全形不切",
    # taiwan prefixes
    "台灣台北市大安區和平東路二段106號",
    "臺灣省新竹市東區光復路二段101號",
    "中華民國台北市中正區重慶南路一段122號",
    "Taiwan台北市內湖區瑞光路513巷",
    # floor patterns
    "台北市羅斯福路三段171號11樓之一",
    "台北市大安區敦化南路二段216號5F",
    "新北市中和區中山路二段366巷10號B2",
    "台北市松山區南京東路五段188號地下1樓",
    "桃園市中壢區中大路300號A室",
    "新竹市東區力行二路1號3棟",
    "台北市南港區三重路19-13號 C108",
    # duplicated city
    "台北市台北市大安區復興南路一段390號",
    "高雄市高雄市苓雅區四維三路2號",
    "新竹縣新竹縣竹北市光明六路10號",
    # trailing junk
    "台中市北區三民路三段129號- ",
    "台南市安平區永華路二段6號 -",
    # combined
    "臺灣台北市台北市信義區市府路45號（市政大樓）8樓/備用地址",
    "１２號倉庫，台中市",
    # lstrip after prefix
    "台灣, 台北市中正區",
    "台灣，台北市中正區",  # fullwidth comma survives lstrip set
    # empty-ish
    "",
    "台灣",
    "（全部都在括號裡）",
    # no-op cases
    "Hsinchu Science Park",
    "新竹科學園區力行路8號",
    # B pattern without digits following elsewhere
    "台北市信義區松智路1號B1F",
    # 室 with 第
    "台北市中山區民生東路三段49號第2室",
]


def esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")


def main() -> None:
    out = "src/test/resources/graft/goldens/geo_clean.tsv"
    with open(out, "w", encoding="utf-8") as f:
        for a in FIXTURES:
            f.write(f"{esc(a)}\t{esc(clean_address(a))}\n")
    print(f"wrote {len(FIXTURES)} goldens to {out}")


if __name__ == "__main__":
    main()
