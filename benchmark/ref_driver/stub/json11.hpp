// Minimal json11-compatible JSON parser for building the reference
// C++ core without its (empty) vendored submodule.  Supports the
// subset the option files use: objects, arrays, strings, numbers,
// bools, null; accessors int_value/number_value/bool_value/
// string_value and operator[].
#pragma once
#include <map>
#include <memory>
#include <string>
#include <vector>
#include <cctype>
#include <cstdlib>

namespace json11 {

class Json {
 public:
    enum Type { NUL, NUMBER, BOOL, STRING, ARRAY, OBJECT };
    Json() : type_(NUL), num_(0), bool_(false) {}

    static Json parse(const std::string& in, std::string& err) {
        size_t i = 0;
        Json j = parse_value(in, i, err);
        if (!err.empty()) return Json();
        return j;
    }

    int int_value() const { return (int)num_; }
    double number_value() const { return num_; }
    bool bool_value() const { return bool_; }
    const std::string& string_value() const { return str_; }
    bool is_null() const { return type_ == NUL; }
    const Json& operator[](const std::string& key) const {
        static Json null_json;
        auto it = obj_.find(key);
        return it == obj_.end() ? null_json : it->second;
    }

 private:
    Type type_;
    double num_;
    bool bool_;
    std::string str_;
    std::vector<Json> arr_;
    std::map<std::string, Json> obj_;

    static void skip_ws(const std::string& s, size_t& i) {
        while (i < s.size() && std::isspace((unsigned char)s[i])) ++i;
    }
    static Json parse_value(const std::string& s, size_t& i,
                            std::string& err) {
        skip_ws(s, i);
        if (i >= s.size()) { err = "eof"; return Json(); }
        char c = s[i];
        Json j;
        if (c == '{') {
            j.type_ = OBJECT; ++i;
            skip_ws(s, i);
            if (i < s.size() && s[i] == '}') { ++i; return j; }
            while (true) {
                skip_ws(s, i);
                if (i >= s.size() || s[i] != '"') { err = "key"; return j; }
                std::string key = parse_string(s, i, err);
                if (!err.empty()) return j;
                skip_ws(s, i);
                if (i >= s.size() || s[i] != ':') { err = "colon"; return j; }
                ++i;
                j.obj_[key] = parse_value(s, i, err);
                if (!err.empty()) return j;
                skip_ws(s, i);
                if (i < s.size() && s[i] == ',') { ++i; continue; }
                if (i < s.size() && s[i] == '}') { ++i; break; }
                err = "obj"; return j;
            }
            return j;
        }
        if (c == '[') {
            j.type_ = ARRAY; ++i;
            skip_ws(s, i);
            if (i < s.size() && s[i] == ']') { ++i; return j; }
            while (true) {
                j.arr_.push_back(parse_value(s, i, err));
                if (!err.empty()) return j;
                skip_ws(s, i);
                if (i < s.size() && s[i] == ',') { ++i; continue; }
                if (i < s.size() && s[i] == ']') { ++i; break; }
                err = "arr"; return j;
            }
            return j;
        }
        if (c == '"') {
            j.type_ = STRING;
            j.str_ = parse_string(s, i, err);
            return j;
        }
        if (!s.compare(i, 4, "true")) { j.type_ = BOOL; j.bool_ = true; i += 4; return j; }
        if (!s.compare(i, 5, "false")) { j.type_ = BOOL; j.bool_ = false; i += 5; return j; }
        if (!s.compare(i, 4, "null")) { i += 4; return j; }
        // number
        size_t start = i;
        while (i < s.size() && (std::isdigit((unsigned char)s[i]) ||
               s[i] == '-' || s[i] == '+' || s[i] == '.' ||
               s[i] == 'e' || s[i] == 'E')) ++i;
        if (i == start) { err = "value"; return j; }
        j.type_ = NUMBER;
        j.num_ = std::strtod(s.substr(start, i - start).c_str(), nullptr);
        return j;
    }
    static std::string parse_string(const std::string& s, size_t& i,
                                    std::string& err) {
        std::string out;
        ++i;  // opening quote
        while (i < s.size() && s[i] != '"') {
            if (s[i] == '\\' && i + 1 < s.size()) {
                ++i;
                switch (s[i]) {
                    case 'n': out += '\n'; break;
                    case 't': out += '\t'; break;
                    default: out += s[i];
                }
            } else {
                out += s[i];
            }
            ++i;
        }
        if (i >= s.size()) { err = "string"; return out; }
        ++i;  // closing quote
        return out;
    }
};

}  // namespace json11
